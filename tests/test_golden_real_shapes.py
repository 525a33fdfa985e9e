"""Golden parity at REAL layer shapes (VERDICT r1 weak #4).

Every other parity test drives tiny random configs; a converter bug that
only manifests at the real geometry (hardcoded dims, head-count math,
position-embedding sizes, attn-scale plan structure) would pass them all.
These tests build the torch references at the SHIPPING shapes (seeded
random weights), convert with the same loader functions the checkpoint
path uses, and assert parity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_package_module

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# real-geometry builds cost ~3 min of this 1-core host's suite wall; the
# shipping shapes never change between commits, so these run per-round
pytestmark = pytest.mark.nightly


def test_clip_vit_l14_real_shape_parity():
    """Full CLIP ViT-L/14 image tower at 224^2 (the deployed geometry:
    hidden 1024, 24 layers, 256 patch tokens; clip_encoder.py:7-79)."""
    from vitron_tpu.models.vision import loader as vloader
    from vitron_tpu.models.vision import vit

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14)
    torch.manual_seed(0)
    tower = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = vit.ViTConfig.clip_vit_l14()
    params = jax.tree.map(jnp.asarray,
                          vloader.convert_hf_clip_vision(tower.state_dict(), cfg))
    px = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        hs = tower(torch.tensor(px), output_hidden_states=True).hidden_states
        want = hs[-2][:, 1:].numpy()          # select layer -2, drop CLS
    got = vit.forward_features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    assert got.shape == (1, 256, 1024)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_llama_7b_layer_real_shape_parity():
    """One Llama block at Vicuna-7B geometry (hidden 4096, ffn 11008,
    32 heads, vocab 32000) through the HF-checkpoint converter."""
    from vitron_tpu.models.llm import llama, loader

    hf_cfg = transformers.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=1, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=128, tie_word_embeddings=True)
    torch.manual_seed(0)
    ref = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = llama.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=1, num_heads=32, num_kv_heads=32, max_seq_len=128,
        rms_norm_eps=1e-6,  # the HF default; Vicuna ships 1e-6 too
        param_dtype=jnp.float32, compute_dtype=jnp.float32)
    sd = {k: v for k, v in ref.state_dict().items()}
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    params = jax.tree.map(jnp.asarray, loader.convert_hf_llama(sd, cfg))

    ids = np.random.RandomState(0).randint(1, 32000, (1, 8))
    with torch.no_grad():
        want = ref(torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward_tokens(params, cfg, jnp.asarray(ids),
                                  positions=jnp.arange(8)[None])
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


def test_sd_unet_real_width_parity():
    """GLIGEN/SD UNet at the real channel widths (model_channels 320,
    context 768, positive_len 768) — two levels at 32^2 latent; the tiny
    test runs 32-wide channels which would mask any hardcoded-width bug."""
    from vitron_tpu.models.diffusion import unet2d

    ref_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(0)
    ref = ref_mod.UNetModel(
        image_size=32, in_channels=4, model_channels=320, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=8, transformer_depth=1, positive_len=768, context_dim=768,
        fuser_type="gatedSA", use_checkpoint=False).eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "alpha_attn" in name or "alpha_dense" in name:
                p.fill_(0.3)

    cfg = unet2d.UNetConfig(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=8,
        context_dim=768, transformer_depth=1)
    params = jax.tree.map(jnp.asarray,
                          unet2d.convert_ldm_unet(ref.state_dict(), cfg))

    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 32, 32).astype(np.float32)
    t = np.array([500], np.int64)
    context = rs.randn(1, 77, 768).astype(np.float32)
    boxes = np.array([[[0.1, 0.1, 0.6, 0.7]] + [[0, 0, 0, 0]] * 29], np.float32)
    masks = np.concatenate([np.ones((1, 1)), np.zeros((1, 29))], 1).astype(np.float32)
    text_emb = rs.randn(1, 30, 768).astype(np.float32)
    with torch.no_grad():
        want = ref({"x": torch.tensor(x), "timesteps": torch.tensor(t),
                    "context": torch.tensor(context),
                    "boxes": torch.tensor(boxes), "masks": torch.tensor(masks),
                    "text_embeddings": torch.tensor(text_emb)}).numpy()

    objs = unet2d.grounding_tokens(params, jnp.asarray(boxes),
                                   jnp.asarray(masks), jnp.asarray(text_emb))
    got = unet2d.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(context), objs)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


def test_t2v_unet_real_plan_parity():
    """UNetSD_T2VBase with the REAL plan structure (4 levels, attn at
    scales 1/2, 1/4, 1/8, head_dim 64, context 1024) at reduced width —
    the tiny parity test uses a 2-level plan with attention at full res,
    which would mask a plan-walk bug in the deeper geometry."""
    from tests import torch_shims
    from vitron_tpu.models.diffusion import unet_sd_video

    torch_shims.install()
    torch_shims.install_i2vgen()
    ref_mod = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.unet.unet_t2v")
    kw = dict(in_dim=4, dim=64, y_dim=1024, context_dim=1024, out_dim=4,
              dim_mult=[1, 2, 4, 4], num_heads=2, head_dim=64,
              num_res_blocks=2, attn_scales=[1 / 2, 1 / 4, 1 / 8],
              dropout=0.0, temporal_attention=True, use_checkpoint=False)
    model = ref_mod.UNetSD_T2VBase(**kw, use_fps_condition=False).eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    cfg = unet_sd_video.UNetSDVideoConfig(
        variant="t2v", in_dim=4, dim=64, y_dim=1024, context_dim=1024,
        out_dim=4, dim_mult=(1, 2, 4, 4), num_heads=2, head_dim=64,
        num_res_blocks=2, attn_scales=(0.5, 0.25, 0.125))
    params = unet_sd_video.convert_torch(model.state_dict(), cfg)

    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 2, 32, 32).astype(np.float32)
    y = rs.randn(1, 3, 1024).astype(np.float32)
    t = np.array([123.0], np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(t), y=torch.tensor(y)).numpy()
    got = unet_sd_video.forward(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(t),
        y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), want,
                               rtol=1e-3, atol=1e-3)
