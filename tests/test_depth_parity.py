"""DPT-Hybrid depth parity vs the vendored MiDaS DPTDepthModel.

Loads the reference modules/StableVideo/annotator/midas/midas/dpt_depth.py
(the StableVideo annotator's default model, annotator/midas/__init__.py:11)
on top of the timm shim hybrid backbone and checks our JAX DPT reproduces
the full depth map from converted weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.diffusion import depth


@pytest.fixture(scope="module")
def ref_dpt():
    torch = pytest.importorskip("torch")
    import tests.torch_shims as shims

    shims.install()
    from tests.conftest import load_reference_package_module

    mod = load_reference_package_module(
        "modules.StableVideo.annotator.midas.midas.dpt_depth")
    torch.manual_seed(0)
    model = mod.DPTDepthModel(path=None, backbone="vitb_rn50_384",
                              non_negative=True).eval()
    # random-but-reasonable weights: default inits leave pos_embed/cls tiny
    # and convs kaiming; perturb norms so affine params are exercised
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.add_(torch.randn_like(p) * 0.02)
            elif "norm" in name and name.endswith(".weight"):
                p.mul_(1.0 + torch.randn_like(p) * 0.05)
    return model


@pytest.mark.nightly
def test_dpt_hybrid_full_parity(ref_dpt):
    import torch

    cfg = depth.DPTConfig.dpt_hybrid()
    params = depth.convert_midas_torch(ref_dpt.state_dict(), cfg)

    px = np.random.RandomState(0).randn(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        want = ref_dpt(torch.tensor(px)).numpy()          # [1, 96, 96]
    got = depth.forward(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_depth_hint_tiny_smoke():
    cfg = depth.DPTConfig.tiny()
    params = depth.init_params(jax.random.PRNGKey(0), cfg)
    img = np.random.RandomState(1).randint(0, 255, (70, 90, 3), np.uint8)
    hint = depth.depth_hint(params, cfg, img)
    assert hint.shape == (70, 90, 3)
    assert np.isfinite(hint).all()
    assert hint.min() >= 0.0 and hint.max() <= 1.0 + 1e-6


def test_dpt_large_shapes():
    cfg = depth.DPTConfig.tiny(variant="dpt_large", patch_size=8,
                               hooks=(0, 1, 0, 1))
    # dpt_large tiny: 4 hooks over 2 layers (duplicated) just for shape flow
    cfg = depth.DPTConfig.dpt_large(
        image_size=64, hidden_size=32, num_layers=4, num_heads=4, mlp_dim=64,
        hooks=(0, 1, 2, 3), features=16, reassemble_dims=(8, 16, 32, 32))
    params = depth.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    d = depth.forward(params, cfg, x)
    assert d.shape == (1, 64, 64)
    assert bool(jnp.isfinite(d).all())


def test_align_corners_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32)
    want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                         scale_factor=2, mode="bilinear",
                         align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = depth.resize_align_corners(jnp.asarray(x), 10, 14)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
