"""Whole-UNet parity for the faithful T2V / i2vgen-xl video UNets.

Loads the vendored reference torch modules (unet_t2v.py / unet_i2vgen.py)
unmodified via dependency shims, re-randomizes every parameter (the
reference zero-inits the output projections, which would make parity
vacuous), converts the state dict with convert_torch and asserts whole-model
output parity - the same bar the SEEM/GLIGEN/DPT families meet.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import load_reference_package_module
from vitron_tpu.models.diffusion import unet_sd_video

torch = pytest.importorskip("torch")
torch_shims.install()
torch_shims.install_i2vgen()

# the reference hardcodes .cuda() in its mask_pos construction
# (unet_i2vgen.py:283); run it on CPU
torch.Tensor.cuda = lambda self, *a, **k: self


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def _tree_shapes(p, path=""):
    out = {}
    if isinstance(p, dict):
        for k, v in p.items():
            out.update(_tree_shapes(v, f"{path}/{k}"))
    elif isinstance(p, (list, tuple)):
        for i, v in enumerate(p):
            out.update(_tree_shapes(v, f"{path}/{i}"))
    else:
        out[path] = tuple(np.shape(p))
    return out


TINY = dict(in_dim=4, dim=32, y_dim=16, context_dim=1024, out_dim=4,
            num_tokens=4, dim_mult=[1, 2], num_heads=2, head_dim=16,
            num_res_blocks=1, attn_scales=[1.0, 0.5], dropout=0.0,
            temporal_attention=True, use_checkpoint=False)

B, F, H, W = 1, 4, 16, 16


def _jax_cfg(variant):
    return unet_sd_video.UNetSDVideoConfig.tiny(
        variant=variant, in_dim=4, dim=32, y_dim=16, context_dim=1024,
        out_dim=4, num_tokens=4, dim_mult=(1, 2), num_heads=2, head_dim=16,
        num_res_blocks=1, attn_scales=(1.0, 0.5))


@pytest.mark.nightly
def test_t2v_unet_parity():
    ref = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.unet.unet_t2v")
    model = ref.UNetSD_T2VBase(**TINY, use_fps_condition=False).eval()
    _randomize(model, seed=0)

    rs = np.random.RandomState(0)
    x = rs.randn(B, 4, F, H, W).astype(np.float32)
    y = rs.randn(B, 3, 1024).astype(np.float32)
    t = np.array([37.0], np.float32)

    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(t),
                     y=torch.tensor(y)).numpy()

    cfg = _jax_cfg("t2v")
    params = unet_sd_video.convert_torch(model.state_dict(), cfg)
    got = unet_sd_video.forward(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t), y=jnp.asarray(y))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_i2vgen_unet_parity():
    ref = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.unet.unet_i2vgen")
    model = ref.UNetSD_I2VGen(**TINY, concat_dim=4,
                              adapter_transformer_layers=1).eval()
    _randomize(model, seed=1)

    rs = np.random.RandomState(1)
    x = rs.randn(B, 4, F, H, W).astype(np.float32)
    y = rs.randn(B, 3, 1024).astype(np.float32)
    image = rs.randn(B, 16).astype(np.float32)       # global CLIP embedding
    local = rs.randn(B, 4, H, W).astype(np.float32)  # first-frame latent
    t = np.array([411.0], np.float32)
    fps = np.array([8.0], np.float32)

    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(t), y=torch.tensor(y),
                     image=torch.tensor(image),
                     local_image=torch.tensor(local),
                     fps=torch.tensor(fps)).numpy()

    cfg = _jax_cfg("i2vgen")
    params = unet_sd_video.convert_torch(model.state_dict(), cfg)
    got = unet_sd_video.forward(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t), y=jnp.asarray(y), fps=jnp.asarray(fps),
        image=jnp.asarray(image),
        local_image=jnp.asarray(local.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("variant", ["t2v", "i2vgen"])
def test_converter_roundtrip_structure(variant):
    """convert_torch and init_params must produce identical trees (paths and
    shapes) - a converter key drift breaks this before it breaks a demo."""
    ref = load_reference_package_module(
        f"modules.i2vgen-xl.tools.modules.unet.unet_{'t2v' if variant == 't2v' else 'i2vgen'}")
    if variant == "t2v":
        model = ref.UNetSD_T2VBase(**TINY, use_fps_condition=False)
    else:
        model = ref.UNetSD_I2VGen(**TINY, concat_dim=4,
                                  adapter_transformer_layers=1)
    cfg = _jax_cfg(variant)
    converted = _tree_shapes(unet_sd_video.convert_torch(model.state_dict(), cfg))
    initialized = _tree_shapes(unet_sd_video.init_params(jax.random.PRNGKey(0), cfg))
    assert converted == initialized


def test_adaptive_avg_pool_matches_torch():
    for hin, win, ho, wo in [(16, 16, 32, 32), (11, 7, 32, 32), (40, 24, 32, 32)]:
        x = np.random.RandomState(hin).randn(2, hin, win, 3).astype(np.float32)
        with torch.no_grad():
            want = torch.nn.functional.adaptive_avg_pool2d(
                torch.tensor(x.transpose(0, 3, 1, 2)), (ho, wo)).numpy()
        got = unet_sd_video.adaptive_avg_pool2d(jnp.asarray(x), (ho, wo))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5)
