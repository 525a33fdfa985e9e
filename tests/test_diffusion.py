"""Diffusion stack parity vs the vendored GLIGEN/ldm torch modules."""
import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_package_module
from vitron_tpu.models.diffusion import clip_text, samplers, unet2d, vae
from vitron_tpu.models.diffusion.layers import convert_position_net
from vitron_tpu.models.diffusion.unet2d import UNetConfig, convert_ldm_unet


torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_openaimodel():
    return load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.openaimodel")


@pytest.fixture(scope="module")
def ref_vae_model():
    return load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.model")


def test_unet_full_parity(ref_openaimodel):
    """Whole tiny GLIGEN UNet (res blocks + spatial transformers with gated
    self-attention fuser + PositionNet): torch forward vs JAX forward on
    converted weights."""
    torch.manual_seed(0)
    ref = ref_openaimodel.UNetModel(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, positive_len=16, context_dim=16,
        fuser_type="gatedSA", use_checkpoint=False,
    ).eval()
    # non-trivial gate alphas (ckpts have trained nonzero alphas)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "alpha_attn" in name or "alpha_dense" in name:
                p.fill_(0.3)

    cfg = UNetConfig.tiny(context_dim=16)
    sd = ref.state_dict()
    params = jax.tree.map(jnp.asarray, convert_ldm_unet(sd, cfg))

    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    t = np.array([500], np.int64)
    context = rs.randn(1, 7, 16).astype(np.float32)
    boxes = np.array([[[0.1, 0.1, 0.6, 0.7], [0.2, 0.3, 0.5, 0.9], [0, 0, 0, 0]]], np.float32)
    masks = np.array([[1.0, 1.0, 0.0]], np.float32)
    text_emb = rs.randn(1, 3, 16).astype(np.float32)

    with torch.no_grad():
        want = ref({
            "x": torch.tensor(x), "timesteps": torch.tensor(t),
            "context": torch.tensor(context), "boxes": torch.tensor(boxes),
            "masks": torch.tensor(masks), "text_embeddings": torch.tensor(text_emb),
        }).numpy()

    objs = unet2d.grounding_tokens(params, jnp.asarray(boxes), jnp.asarray(masks),
                                   jnp.asarray(text_emb))
    got = unet2d.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(context), objs)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vae_encoder_decoder_parity(ref_vae_model):
    torch.manual_seed(1)
    enc = ref_vae_model.Encoder(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), dropout=0.0, in_channels=3, resolution=32,
        z_channels=4, double_z=True).eval()
    dec = ref_vae_model.Decoder(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), dropout=0.0, in_channels=3, resolution=32,
        z_channels=4).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})

    cfg = vae.VAEConfig.tiny()
    params = jax.tree.map(jnp.asarray, vae.convert_ldm_vae(sd, cfg))

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(torch.tensor(x)))
        mean_t, logvar_t = torch.chunk(moments, 2, dim=1)
        recon_t = dec(post_quant(mean_t)).numpy()
    mean_j, logvar_j = vae.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(mean_j).transpose(0, 3, 1, 2), mean_t.numpy(), rtol=3e-4, atol=3e-4)
    recon_j = vae.decode(params, cfg, mean_j)
    np.testing.assert_allclose(
        np.asarray(recon_j).transpose(0, 3, 1, 2), recon_t, rtol=3e-4, atol=3e-4)


def test_clip_text_parity():
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        hidden_act="quick_gelu", attn_implementation="eager")
    torch.manual_seed(0)
    ref = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = clip_text.TextConfig.tiny()
    params = jax.tree.map(jnp.asarray, clip_text.convert_hf_clip_text(ref.state_dict(), cfg))
    ids = np.random.RandomState(0).randint(0, 128, (2, 16))
    with torch.no_grad():
        want = ref(torch.tensor(ids)).last_hidden_state.numpy()
    got = clip_text.encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _mock_eps_torch(x, t):
    tt = t.float().view(-1, 1, 1, 1) / 1000.0
    return 0.05 * x * (1.0 + tt)


def _mock_eps_jax(x, t, gate):
    tt = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1) / 1000.0
    return 0.05 * x * (1.0 + tt)


def test_plms_parity():
    """Full 10-step PLMS loop vs the reference sampler with a mock eps model."""
    ddpm_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.models.diffusion.ddpm")
    plms_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.models.diffusion.plms")

    diffusion = ddpm_mod.DDPM(beta_schedule="linear", timesteps=1000,
                              linear_start=0.00085, linear_end=0.012)

    class Model:
        def __call__(self, inp):
            return _mock_eps_torch(inp["x"], inp["timesteps"])

    sampler = plms_mod.PLMSSampler(diffusion, Model())
    x0 = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = sampler.sample(S=10, shape=(1, 4, 8, 8),
                              input={"x": torch.tensor(x0), "timesteps": None},
                              uc=None, guidance_scale=1).numpy()

    sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
    got = samplers.plms_sample(_mock_eps_jax, jnp.asarray(x0), sched, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_ddim_parity():
    ddpm_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.models.diffusion.ddpm")
    ddim_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.models.diffusion.ddim")

    diffusion = ddpm_mod.DDPM(beta_schedule="linear", timesteps=1000,
                              linear_start=0.00085, linear_end=0.012)

    class Model:
        def __call__(self, inp):
            return _mock_eps_torch(inp["x"], inp["timesteps"])

    sampler = ddim_mod.DDIMSampler(diffusion, Model())
    x0 = np.random.RandomState(1).randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = sampler.sample(S=10, shape=(1, 4, 8, 8),
                              input={"x": torch.tensor(x0), "timesteps": None},
                              uc=None, guidance_scale=1)
        want = (want[0] if isinstance(want, tuple) else want).numpy()

    sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
    got = samplers.ddim_sample(_mock_eps_jax, jnp.asarray(x0), sched, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_alpha_generator_parity():
    # the reference file imports torchvision at module scope but
    # alpha_generator itself is numpy-only — stub the missing dep
    import sys
    import types

    for name in ("torchvision", "torchvision.transforms"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            sys.modules[name] = m
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    ref = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.task_grounded_generation")
    for typ in ([1, 0, 0], [0.8, 0.1, 0.1], [0.3, 0.3, 0.4]):
        want = np.asarray(ref.alpha_generator(20, list(typ)), np.float32)
        got = samplers.alpha_generator(20, typ)
        np.testing.assert_allclose(got, want)


def test_dpm_solver_runs():
    sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
    x0 = jnp.asarray(np.random.RandomState(2).randn(1, 4, 8, 8).astype(np.float32))
    out = samplers.dpm_solver_pp_2m(_mock_eps_jax, x0, sched, 10)
    assert out.shape == x0.shape
    assert bool(jnp.isfinite(out).all())


class _StubTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        out = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            ids = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][: max_length - 2] + [127]
            out[i, : len(ids)] = ids
        return {"input_ids": out}


def test_gligen_pipeline_tiny_end_to_end():
    from vitron_tpu.models.diffusion import gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d as u, vae as v, clip_text as ct

    cfg = gp.GligenConfig.tiny()
    rngs = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = u.init_params(rngs[0], cfg.unet, grounding=True)
    vae_params = v.init_params(rngs[1], cfg.vae)
    text_params = ct.init_params(rngs[2], cfg.text)
    pipe = gp.GligenPipeline(cfg, unet_params, vae_params, text_params,
                             tokenizer=_StubTokenizer())
    img = pipe.generate(
        "a cat on a table", boxes=[[0.1, 0.1, 0.5, 0.5]], phrases=["a cat"],
        guidance_scale=7.5, rng=jax.random.PRNGKey(1), steps=5)
    assert img.shape == (32, 32, 3)
    assert img.dtype == jnp.uint8
    # deterministic given the same rng
    img2 = pipe.generate(
        "a cat on a table", boxes=[[0.1, 0.1, 0.5, 0.5]], phrases=["a cat"],
        guidance_scale=7.5, rng=jax.random.PRNGKey(1), steps=5)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))


def test_gligen_inpaint_tiny_end_to_end():
    import dataclasses as dc

    from vitron_tpu.models.diffusion import gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d as u, vae as v, clip_text as ct

    cfg = gp.GligenConfig.tiny()
    inpaint_unet_cfg = dc.replace(cfg.unet, in_channels=9)
    rngs = jax.random.split(jax.random.PRNGKey(3), 3)
    unet_params = u.init_params(rngs[0], inpaint_unet_cfg, grounding=True)
    vae_params = v.init_params(rngs[1], cfg.vae)
    text_params = ct.init_params(rngs[2], cfg.text)
    pipe = gp.GligenPipeline(cfg, None, vae_params, text_params,
                             inpaint_unet_params=unet_params,
                             tokenizer=_StubTokenizer())
    src = jnp.asarray(np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8))
    img = pipe.generate(
        "replace with a dog", boxes=[[0.2, 0.2, 0.8, 0.8]], phrases=["a dog"],
        guidance_scale=30.0, rng=jax.random.PRNGKey(1), steps=5,
        inpaint_image=src)
    assert img.shape == (32, 32, 3)


def test_position_net_with_image_parity():
    """Text+image grounding PositionNet vs the vendored torch module."""
    from vitron_tpu.models.diffusion.layers import (
        convert_position_net_with_image,
        position_net_with_image,
    )

    mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.positionnet_with_image")
    torch.manual_seed(0)
    ref = mod.PositionNet(positive_len=16, out_dim=24).eval()
    sd = {f"position_net.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_position_net_with_image(sd))

    rs = np.random.RandomState(0)
    boxes = rs.rand(1, 5, 4).astype(np.float32)
    masks = (rs.rand(1, 5) > 0.3).astype(np.float32)
    tmask = masks * (rs.rand(1, 5) > 0.2)
    imask = masks * (rs.rand(1, 5) > 0.5)
    temb = rs.randn(1, 5, 16).astype(np.float32)
    iemb = rs.randn(1, 5, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(boxes), torch.tensor(masks), torch.tensor(tmask),
                   torch.tensor(imask), torch.tensor(temb), torch.tensor(iemb)).numpy()
    got = position_net_with_image(
        params, jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(tmask),
        jnp.asarray(imask), jnp.asarray(temb), jnp.asarray(iemb))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.nightly
def test_gligen_style_pipeline_tiny():
    """Text+image grounded generation end-to-end with a with-image
    PositionNet and CLIP vision pooled features."""
    import dataclasses as dc

    from vitron_tpu.models.diffusion import gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d as u, vae as v, clip_text as ct
    from vitron_tpu.models.vision import vit

    cfg = gp.GligenConfig.tiny()
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    unet_params = u.init_params(ks[0], cfg.unet, grounding=True)
    # swap in a with-image position net (style checkpoints carry this)
    cd = cfg.text.hidden_size
    pos_dim = 8 * 2 * 4

    def dense(key, cin, cout):
        return jax.random.normal(key, (cin, cout)) / np.sqrt(cin)

    kk = jax.random.split(ks[5], 6)
    unet_params["position_net"] = {
        "null_text": jnp.zeros((cd,)), "null_image": jnp.zeros((cd,)),
        "null_position": jnp.zeros((pos_dim,)),
        "text": {"w0": dense(kk[0], cd + pos_dim, 32), "b0": jnp.zeros((32,)),
                 "w1": dense(kk[1], 32, 32), "b1": jnp.zeros((32,)),
                 "w2": dense(kk[2], 32, cd), "b2": jnp.zeros((cd,))},
        "image": {"w0": dense(kk[3], cd + pos_dim, 32), "b0": jnp.zeros((32,)),
                  "w1": dense(kk[4], 32, 32), "b1": jnp.zeros((32,)),
                  "w2": dense(kk[5], 32, cd), "b2": jnp.zeros((cd,))},
    }
    vcfg = vit.ViTConfig.tiny(hidden_size=24, num_heads=4)
    vparams = vit.init_params(ks[3], vcfg)
    vproj = jax.random.normal(ks[4], (24, cd)) * 0.1
    projm = jax.random.normal(jax.random.PRNGKey(9), (cd, cd)) * 0.1

    pipe = gp.GligenStylePipeline(
        cfg, unet_params, v.init_params(ks[1], cfg.vae),
        ct.init_params(ks[2], cfg.text),
        vision_params=vparams, vision_cfg=vcfg, visual_proj=vproj,
        projection_matrix=projm, tokenizer=_StubTokenizer())
    style = jnp.asarray(np.random.RandomState(0).rand(1, 28, 28, 3), jnp.float32)
    img = pipe.generate_styled(
        "a vase in this style", boxes=[[0.2, 0.2, 0.8, 0.8]],
        phrases=["a vase"], style_images=style, rng=jax.random.PRNGKey(1),
        steps=5)
    assert img.shape == (32, 32, 3)
    assert img.dtype == jnp.uint8
    # reprojection math: norm is exactly 28.7
    feats = pipe.image_features(style)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                               28.7, rtol=1e-4)


def test_gligen_checkpoint_bundle_roundtrip(ref_openaimodel, tmp_path):
    """Save a reference-layout .pth bundle (model/autoencoder/text_encoder
    state dicts) and load it through load_gligen_checkpoint; the loaded UNet
    must match the torch forward."""
    import transformers

    from vitron_tpu.models.diffusion import gligen_pipeline as gp

    torch.manual_seed(0)
    ref_unet = ref_openaimodel.UNetModel(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, positive_len=16, context_dim=16,
        fuser_type="gatedSA", use_checkpoint=False).eval()
    vae_mod_ref = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.model")
    enc = vae_mod_ref.Encoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(), dropout=0.0, in_channels=3,
                              resolution=32, z_channels=4, double_z=True)
    dec = vae_mod_ref.Decoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(), dropout=0.0, in_channels=3,
                              resolution=32, z_channels=4)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    vae_sd = {}
    vae_sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    vae_sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    vae_sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    vae_sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})

    text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        hidden_act="quick_gelu")).eval()

    bundle = {"model": ref_unet.state_dict(), "autoencoder": vae_sd,
              "text_encoder": {f"transformer.{k}": v
                               for k, v in text.state_dict().items()}}
    path = tmp_path / "gligen_tiny.pth"
    torch.save(bundle, str(path))

    cfg = gp.GligenConfig.tiny()
    unet_params, vae_params, text_params = gp.load_gligen_checkpoint(str(path), cfg)

    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    ctx = rs.randn(1, 7, 16).astype(np.float32)
    boxes = np.zeros((1, 3, 4), np.float32)
    masks = np.zeros((1, 3), np.float32)
    temb = np.zeros((1, 3, 16), np.float32)
    with torch.no_grad():
        want = ref_unet({"x": torch.tensor(x), "timesteps": torch.tensor([300]),
                         "context": torch.tensor(ctx), "boxes": torch.tensor(boxes),
                         "masks": torch.tensor(masks),
                         "text_embeddings": torch.tensor(temb)}).numpy()
    params = jax.tree.map(jnp.asarray, unet_params)
    objs = unet2d.grounding_tokens(params, jnp.asarray(boxes), jnp.asarray(masks),
                                   jnp.asarray(temb))
    got = unet2d.forward(params, cfg.unet, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray([300]), jnp.asarray(ctx), objs)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)

def test_gligen_pipeline_w8a8_serving_knob(monkeypatch):
    """VITRON_UNET_QUANT=w8a8 quantizes the resident UNet's 3x3 convs to
    the int8-MXU form at pipeline construction; generation still runs e2e
    and the output stays close to bf16. (The knob is a gated NEGATIVE-
    result record on v5e — 22.3 vs 53.6 CFG steps/s, see
    unet2d.quantize_params — this test pins that the path stays correct.)"""
    from vitron_tpu.models.diffusion import gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d as u, vae as v, clip_text as ct

    cfg = gp.GligenConfig.tiny()
    rngs = jax.random.split(jax.random.PRNGKey(0), 3)
    unet_params = u.init_params(rngs[0], cfg.unet, grounding=True)
    vae_params = v.init_params(rngs[1], cfg.vae)
    text_params = ct.init_params(rngs[2], cfg.text)

    def make():
        pipe = gp.GligenPipeline(cfg, unet_params, vae_params, text_params,
                                 tokenizer=_StubTokenizer())
        out = pipe.generate(
            "a cat on a table", boxes=[[0.1, 0.1, 0.5, 0.5]],
            phrases=["a cat"], guidance_scale=7.5,
            rng=jax.random.PRNGKey(1), steps=5)
        return pipe, out

    def n_int8_leaves(tree):
        return sum(1 for leaf in jax.tree.leaves(tree)
                   if hasattr(leaf, "dtype") and leaf.dtype == jnp.int8)

    monkeypatch.delenv("VITRON_UNET_QUANT", raising=False)
    pipe, want = make()
    assert n_int8_leaves(pipe.unet_params) == 0
    want = np.asarray(want, np.float32)
    monkeypatch.setenv("VITRON_UNET_QUANT", "w8a8")
    pipe, got = make()
    # the knob must actually have quantized convs: int8 'qc' leaves in the
    # resident tree (if quant_default() silently broke, got==want and the
    # closeness bound below would pass trivially)
    assert n_int8_leaves(pipe.unet_params) > 0
    got = np.asarray(got, np.float32)
    # uint8 images out of a tiny random-weight UNet: just require broad
    # agreement (the quantization rel-err test pins the tight bound)
    assert np.mean(np.abs(got - want)) < 16.0


def test_quantize_params_idempotent():
    """Applying quantize_params twice is a no-op for both UNets: already-
    quantized {'qc'/'q8t','s'} dicts and int8 leaves are skipped, so a
    double-quantize (e.g. env knob + explicit call) can't corrupt the tree
    (round-4 advisor finding)."""
    from vitron_tpu.models.diffusion import unet2d as u
    from vitron_tpu.models.diffusion import unet_sd_video as usv

    cfg2d = u.UNetConfig.tiny()
    p2d = u.init_params(jax.random.PRNGKey(0), cfg2d)
    q1 = u.quantize_params(p2d, min_channels=8)
    q2 = u.quantize_params(q1, min_channels=8)
    chex.assert_trees_all_equal(q1, q2)

    cfgv = usv.UNetSDVideoConfig.tiny("t2v")
    pv = usv.init_params(jax.random.PRNGKey(1), cfgv)
    qv1 = usv.quantize_params(pv, min_channels=8, min_dot_dim=8,
                              min_tconv_dim=8)
    qv2 = usv.quantize_params(qv1, min_channels=8, min_dot_dim=8,
                              min_tconv_dim=8)
    chex.assert_trees_all_equal(qv1, qv2)


def test_upsample2x_nearest_matches_resize():
    """layers.upsample2x_nearest (broadcast+reshape) == jax.image.resize
    nearest at exact 2x — the torch nn.Upsample(scale_factor=2) semantics
    every UNet/VAE up block uses."""
    from vitron_tpu.models.diffusion.layers import upsample2x_nearest

    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7, 3), jnp.float32)
    want = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    got = upsample2x_nearest(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
