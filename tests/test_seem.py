"""SEEM: FocalNet/position-embed/point-sample parity + task-flow smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import load_reference_package_module
from vitron_tpu.models.seem import decoder as dec
from vitron_tpu.models.seem import focalnet, language, model as seem_model, pixel_decoder

torch = pytest.importorskip("torch")
torch_shims.install()


def test_focalnet_parity():
    """Full tiny FocalNet (conv stem, focal modulation, post-LN, layerscale,
    scaling modulator) vs the reference torch backbone."""
    ref_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.backbone.focal")
    torch.manual_seed(0)
    ref = ref_mod.FocalNet(
        patch_size=4, embed_dim=16, depths=(1, 1), mlp_ratio=4.0,
        focal_levels=(2, 2), focal_windows=(3, 3), use_conv_embed=True,
        use_postln=True, use_postln_in_modulation=False,
        scaling_modulator=True, use_layerscale=True,
        out_indices=(0, 1), patch_norm=True, frozen_stages=-1,
    )
    ref.eval()  # the reference train() override returns None
    # layerscale init is 1e-4 which hides errors; randomize
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if "gamma" in n:
                p.uniform_(0.5, 1.5)

    cfg = focalnet.FocalNetConfig.tiny()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, focalnet.convert_torch(sd, cfg))

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        outs = ref(torch.tensor(x))  # dict res2, res3 (NCHW)
    got = focalnet.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    keys = sorted(outs.keys())
    for i, k in enumerate(keys):
        want = outs[k].numpy()
        g = np.asarray(got[i]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, want, rtol=3e-4, atol=3e-4)


def test_position_embedding_sine_parity():
    ref_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.modules.position_encoding")
    pe = ref_mod.PositionEmbeddingSine(16, normalize=True)
    x = torch.zeros(1, 32, 7, 9)
    with torch.no_grad():
        want = pe(x).numpy()[0]  # [32, 7, 9]
    got = np.asarray(pixel_decoder.position_embedding_sine(7, 9, 32))
    got = got.reshape(7, 9, 32).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_point_sample_parity():
    feat = np.random.RandomState(0).randn(1, 8, 10, 12).astype(np.float32)
    pts = np.random.RandomState(1).rand(1, 5, 2).astype(np.float32)  # (x, y) for torch
    want = torch.nn.functional.grid_sample(
        torch.tensor(feat), torch.tensor(pts * 2 - 1)[:, None],
        align_corners=True)[0, :, 0].numpy().T  # [5, C]
    # ours takes (y, x) normalized in [0, 1]
    got = dec.point_sample(jnp.asarray(feat[0].transpose(1, 2, 0)),
                           jnp.asarray(pts[0][:, ::-1]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_decoder_layer_parity():
    """Post-norm cross/self attention layers vs torch nn.MultiheadAttention
    (the reference SelfAttentionLayer/CrossAttentionLayer, seem.py:29-145)."""
    d, heads, nq, nk = 32, 4, 7, 11
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True).eval()
    norm = torch.nn.LayerNorm(d).eval()
    rs = np.random.RandomState(0)
    q = rs.randn(1, nq, d).astype(np.float32)
    k = rs.randn(1, nk, d).astype(np.float32)
    qpos = rs.randn(1, nq, d).astype(np.float32)
    kpos = rs.randn(1, nk, d).astype(np.float32)
    blocked = rs.rand(1, nq, nk) > 0.7
    blocked[..., 0] = False  # keep at least one key visible

    with torch.no_grad():
        am = torch.tensor(blocked).repeat_interleave(heads, dim=0)
        t2, _ = mha(torch.tensor(q + qpos), torch.tensor(k + kpos),
                    torch.tensor(k), attn_mask=am)
        want = norm(torch.tensor(q) + t2).numpy()

    p = {
        "in_w": np.ascontiguousarray(mha.in_proj_weight.detach().numpy().T),
        "in_b": mha.in_proj_bias.detach().numpy(),
        "out_w": np.ascontiguousarray(mha.out_proj.weight.detach().numpy().T),
        "out_b": mha.out_proj.bias.detach().numpy(),
    }
    att = dec._masked_mha(jnp.asarray(q + qpos), jnp.asarray(k + kpos),
                          jnp.asarray(k), jax.tree.map(jnp.asarray, p),
                          heads, jnp.asarray(blocked))
    got = pixel_decoder._ln(jnp.asarray(q) + att,
                            {"scale": jnp.asarray(norm.weight.detach().numpy()),
                             "bias": jnp.asarray(norm.bias.detach().numpy())})
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_seem():
    cfg = seem_model.SeemConfig.tiny()
    params = seem_model.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class _StubTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), max_length), np.int64)
        mask = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            toks = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][: max_length - 2] + [120]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_segment_text_smoke(tiny_seem):
    cfg, params = tiny_seem
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    tok = _StubTokenizer()(["the red ball"], max_length=cfg.lang.context_length)
    mask, _ = seem_model.segment_text(
        params, cfg, jnp.asarray(img), jnp.asarray(tok["input_ids"]),
        jnp.asarray(tok["attention_mask"]))
    assert mask.shape == (16, 16)  # H/4 mask resolution
    assert bool(jnp.isfinite(mask).all())


def test_segment_stroke_smoke(tiny_seem):
    cfg, params = tiny_seem
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    stroke = np.zeros((64, 64), bool)
    stroke[20:36, 24:40] = True
    pts, valid = dec.sample_stroke_points(stroke, cfg.decoder.max_spatial_len,
                                          np.random.RandomState(0))
    mask, _ = seem_model.segment_stroke(
        params, cfg, jnp.asarray(img), jnp.asarray(pts), jnp.asarray(valid))
    assert mask.shape == (16, 16)
    assert bool(jnp.isfinite(mask).all())


def test_track_video_smoke(tiny_seem):
    cfg, params = tiny_seem
    rs = np.random.RandomState(0)
    ref = rs.randint(0, 255, (64, 64, 3), np.uint8)
    frames = rs.randint(0, 255, (3, 64, 64, 3), np.uint8)
    stroke = np.zeros((64, 64), bool)
    stroke[10:30, 10:30] = True
    pts, valid = dec.sample_stroke_points(stroke, cfg.decoder.max_spatial_len,
                                          np.random.RandomState(0))
    masks = seem_model.track_video(
        params, cfg, jnp.asarray(frames), jnp.asarray(ref),
        jnp.asarray(pts), jnp.asarray(valid))
    assert masks.shape == (3, 16, 16)
    assert masks.dtype == bool
