"""Vision towers: ViT parity vs HF CLIP, temporal attention, region extractor."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.vision import projector, region_extractor
from vitron_tpu.models.vision.vit import (
    ViTConfig,
    forward_features,
    forward_video_features,
    init_params,
)


def test_forward_shapes():
    cfg = ViTConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    feats = forward_features(params, cfg, x)
    assert feats.shape == (2, 16, 32)


def test_video_forward_shapes():
    cfg = ViTConfig.tiny(add_time_attn=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
    feats = forward_video_features(params, cfg, x)
    assert feats.shape == (2, 4, 16, 32)


@pytest.fixture(scope="module")
def hf_clip():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=7,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.CLIPVisionModel(hf_cfg).eval()


def test_hf_clip_parity(hf_clip):
    """feature_select(hidden_states[-2])[:, 1:] parity vs HF CLIPVisionModel.

    Mirrors the reference tower (clip_encoder.py:42-55,
    languagebind/__init__.py:96-101)."""
    import torch

    from vitron_tpu.models.vision.loader import convert_hf_clip_vision

    cfg = ViTConfig.tiny()
    params = jax.tree.map(jnp.asarray, convert_hf_clip_vision(hf_clip.state_dict(), cfg))
    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = hf_clip(torch.tensor(px), output_hidden_states=True)
    ref = out.hidden_states[-2][:, 1:].numpy()
    got = forward_features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_temporal_attention_parity():
    """Video layer math vs a torch replica of the reference temporal block
    (modeling_video.py:105-134): t_emb add -> temporal LN+MHA residual ->
    spatial pre-LN MHA -> pre-LN quick_gelu MLP."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    cfg = ViTConfig.tiny(add_time_attn=True, num_layers=1)
    params = init_params(jax.random.PRNGKey(42), cfg)
    B, T, N, H = 2, 4, 17, 32

    rs = np.random.RandomState(0)
    x = rs.randn(B * T, N, H).astype(np.float32)

    def torch_mha(xt, p):
        q = xt @ torch.tensor(np.asarray(p["wq"][0])) + torch.tensor(np.asarray(p["bq"][0]))
        k = xt @ torch.tensor(np.asarray(p["wk"][0])) + torch.tensor(np.asarray(p["bk"][0]))
        v = xt @ torch.tensor(np.asarray(p["wv"][0])) + torch.tensor(np.asarray(p["bv"][0]))
        b, n, h = xt.shape
        nh, d = 4, h // 4
        q = q.view(b, n, nh, d).transpose(1, 2)
        k = k.view(b, n, nh, d).transpose(1, 2)
        v = v.view(b, n, nh, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(d), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, h)
        return o @ torch.tensor(np.asarray(p["wo"][0])) + torch.tensor(np.asarray(p["bo"][0]))

    def torch_ln(xt, p):
        return tnn.functional.layer_norm(
            xt, (H,), torch.tensor(np.asarray(p["scale"][0])),
            torch.tensor(np.asarray(p["bias"][0])), eps=cfg.layer_norm_eps)

    lp = params["layers"]
    with torch.no_grad():
        xt = torch.tensor(x)
        # temporal
        xr = xt.view(B, T, N, H).permute(0, 2, 1, 3).reshape(B * N, T, H)
        xr = xr + torch.tensor(np.asarray(lp["t_emb"][0]))
        res = xr
        xr = res + torch_mha(torch_ln(xr, lp["t_ln"]), lp["t_attn"])
        xt = xr.view(B, N, T, H).permute(0, 2, 1, 3).reshape(B * T, N, H)
        # spatial
        xt = xt + torch_mha(torch_ln(xt, lp["ln1"]), lp["attn"])
        xn = torch_ln(xt, lp["ln2"])
        h = xn @ torch.tensor(np.asarray(lp["fc1"][0])) + torch.tensor(np.asarray(lp["b1"][0]))
        h = h * torch.sigmoid(1.702 * h)
        ref = (xt + h @ torch.tensor(np.asarray(lp["fc2"][0])) + torch.tensor(np.asarray(lp["b2"][0]))).numpy()

    # run just the scan body via forward_video_features on a 1-layer config,
    # feeding x as pre-LN'd embeddings: easiest is to invoke the body math
    # directly through the public function with crafted inputs. Instead we
    # re-run the body by calling the internal loop with embed/pre_ln identity.
    from vitron_tpu.models.vision import vit as vitmod

    xj = jnp.asarray(x)
    n_tok, hdim = N, H

    def body(xv):
        lpj = jax.tree.map(lambda a: a[0], params["layers"])
        lpj = jax.tree.map(lambda a: a[None] if False else a, lpj)
        xt = xv.reshape(B, T, n_tok, hdim).transpose(0, 2, 1, 3).reshape(B * n_tok, T, hdim)
        xt = xt + lpj["t_emb"][:T]
        res = xt
        xt = vitmod.layer_norm(xt, lpj["t_ln"], cfg.layer_norm_eps)
        xt = res + vitmod._mha(xt, lpj["t_attn"], cfg.num_heads)
        xv = xt.reshape(B, n_tok, T, hdim).transpose(0, 2, 1, 3).reshape(B * T, n_tok, hdim)
        xv = xv + vitmod._mha(vitmod.layer_norm(xv, lpj["ln1"], cfg.layer_norm_eps), lpj["attn"], cfg.num_heads)
        xn = vitmod.layer_norm(xv, lpj["ln2"], cfg.layer_norm_eps)
        return xv + vitmod.quick_gelu(xn @ lpj["fc1"] + lpj["b1"]) @ lpj["fc2"] + lpj["b2"]

    got = body(xj)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def ref_region(request):
    import sys
    sys.path.insert(0, str(request.config.rootdir))
    from tests.conftest import load_reference_module

    return load_reference_module("vitron/model/region_extractor/layer.py", "ref_region_layer")


def test_region_extractor_parity(ref_region):
    """Mask pooling + MLP + loc encoder vs reference RegionExtractor weights."""
    import torch

    torch.manual_seed(0)
    ref = ref_region.RegionExtractor(in_dim=16, out_dim=32, patch_size=7, image_size=28).eval()

    # map torch weights -> our tree
    sd = {f"model.region_extractor.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, region_extractor.convert_hf(sd))

    rs = np.random.RandomState(0)
    feats = rs.randn(2, 16, 16).astype(np.float32)  # [B, 4x4 grid, C]
    boxes = np.array([[3.0, 5.0, 20.0, 25.0], [0.0, 0.0, 28.0, 28.0]], np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(feats), torch.tensor(boxes)).numpy()
    got = region_extractor.apply(params, jnp.asarray(feats), jnp.asarray(boxes), image_size=28)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_projector_parity():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    torch.manual_seed(0)
    seq = tnn.Sequential(tnn.Linear(16, 32), tnn.GELU(), tnn.Linear(32, 32)).eval()
    sd = {f"model.mm_projector.{k}": v for k, v in seq.state_dict().items()}
    params = jax.tree.map(jnp.asarray, projector.convert_hf(sd))
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    with torch.no_grad():
        want = seq(torch.tensor(x)).numpy()
    got = projector.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_folded_normalization_equals_preprocessing():
    """Tower with normalization folded into patch_proj on RAW pixels ==
    tower on preprocessed pixels (zero-cost preprocessing)."""
    from vitron_tpu.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    from vitron_tpu.models.vision.vit import fold_normalization_into_patch_proj

    cfg = ViTConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, 28, 28, 3), np.uint8))
    mean = jnp.asarray(OPENAI_DATASET_MEAN)
    std = jnp.asarray(OPENAI_DATASET_STD)
    normed = (raw.astype(jnp.float32) / 255.0 - mean) / std

    want = forward_features(params, cfg, normed)
    folded = fold_normalization_into_patch_proj(
        params, cfg, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)
    got = forward_features(folded, cfg, raw.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_vit_bf16_close_to_f32():
    """The serving config runs towers in bf16 (VitronConfig.serving); the
    features must stay close to the f32 reference path."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.vision import vit

    cfg32 = vit.ViTConfig.tiny()
    p32 = vit.init_params(jax.random.PRNGKey(0), cfg32)
    cfg16 = vit.ViTConfig.tiny(param_dtype=jnp.bfloat16,
                               compute_dtype=jnp.bfloat16)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
    pix = jax.random.uniform(jax.random.PRNGKey(1),
                             (2, cfg32.image_size, cfg32.image_size, 3))
    f32 = vit.forward_features(p32, cfg32, pix)
    f16 = vit.forward_features(p16, cfg16, pix).astype(jnp.float32)
    assert f16.dtype == jnp.float32 and f16.shape == f32.shape
    denom = float(jnp.max(jnp.abs(f32))) + 1e-6
    rel = float(jnp.max(jnp.abs(f16 - f32))) / denom
    assert rel < 0.05, rel
