"""Parity for the GLIGEN grounding-net variants (canny/depth/hed/normal/
sem/keypoint) vs the vendored reference modules
(modules/GLIGEN/ldm/modules/diffusionmodules/*_grounding_net.py)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import REFERENCE_ROOT, load_reference_package_module
from vitron_tpu.models.diffusion import grounding_nets as gn

torch = pytest.importorskip("torch")
torch_shims.install()


def _install_ldm_pkg():
    """The grounding nets import the top-level `ldm` package absolutely."""
    if "ldm" not in sys.modules:
        pkg = types.ModuleType("ldm")
        pkg.__path__ = [str(REFERENCE_ROOT / "modules/GLIGEN/ldm")]
        sys.modules["ldm"] = pkg


def _load_grounding(name):
    _install_ldm_pkg()
    mod = load_reference_package_module(
        f"modules.GLIGEN.ldm.modules.diffusionmodules.{name}")
    cn = load_reference_package_module(
        "modules.GLIGEN.ldm.modules.diffusionmodules.convnext")
    # pretrained=True would try to download ImageNet weights (zero egress);
    # the parity test randomizes everything anyway
    mod.convnext_tiny = lambda pretrained=False, **kw: cn.ConvNeXt(
        depths=[3, 3, 9, 3], dims=[96, 192, 384, 768])
    return mod


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_convnext_tiny_parity():
    cn = load_reference_package_module(
        "modules.GLIGEN.ldm.modules.diffusionmodules.convnext")
    model = cn.ConvNeXt(depths=[3, 3, 9, 3], dims=[96, 192, 384, 768]).eval()
    _randomize(model, 0)
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()        # [1, 768, 2, 2]
    params = gn.convert_convnext_torch(model.state_dict(), pfx="")
    got = gn.convnext_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["canny", "depth", "hed", "normal"])
def test_hint_position_net_parity(variant):
    mod = _load_grounding(f"{variant}_grounding_net")
    # resize_input=64 keeps the test light; input fed at 64 so the torch
    # nearest-interpolate is identity (conventions differ sub-pixel)
    model = mod.PositionNet(resize_input=64, out_dim=48).eval()
    _randomize(model, 1)
    rs = np.random.RandomState(1)
    hint = rs.rand(2, 3, 64, 64).astype(np.float32)
    mask = np.array([1.0, 0.0], np.float32)
    with torch.no_grad():
        want = model(torch.tensor(hint), torch.tensor(mask)).numpy()
    params = gn.convert_hint_position_net(model.state_dict(), pfx="")
    got = gn.position_net_hint(params, jnp.asarray(hint.transpose(0, 2, 3, 1)),
                               jnp.asarray(mask), resize_input=64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_sem_position_net_parity():
    mod = _load_grounding("sem_grounding_net")
    model = mod.PositionNet(resize_input=64, in_dim=12, out_dim=48).eval()
    _randomize(model, 2)
    rs = np.random.RandomState(2)
    sem = rs.rand(1, 12, 64, 64).astype(np.float32)
    mask = np.ones((1,), np.float32)
    with torch.no_grad():
        want = model(torch.tensor(sem), torch.tensor(mask)).numpy()
    params = gn.convert_hint_position_net(model.state_dict(), pfx="")
    got = gn.position_net_hint(params, jnp.asarray(sem.transpose(0, 2, 3, 1)),
                               jnp.asarray(mask), resize_input=64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_keypoint_position_net_parity():
    mod = _load_grounding("keypoint_grounding_net")
    model = mod.PositionNet(max_persons_per_image=3, out_dim=48).eval()
    _randomize(model, 3)
    rs = np.random.RandomState(3)
    points = rs.rand(2, 3 * 17, 2).astype(np.float32)
    masks = (rs.rand(2, 3 * 17) > 0.3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(points), torch.tensor(masks)).numpy()
    params = gn.convert_keypoint_position_net(model.state_dict(), pfx="")
    got = gn.position_net_keypoint(params, jnp.asarray(points), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name,in_ch,kwargs", [
    ("canny_grounding_downsampler", 3, dict(grayscale=True, mode="bicubic")),
    ("normal_grounding_downsampler", 3, dict(grayscale=False, mode="bicubic")),
    ("sem_grounding_downsampler", 12, dict(grayscale=False, mode="nearest")),
])
def test_grounding_downsampler_parity(name, in_ch, kwargs):
    mod = _load_grounding(name)
    if in_ch == 12:
        model = mod.GroundingDownsampler(resize_input=32, in_dim=12, out_dim=8).eval()
    else:
        model = mod.GroundingDownsampler(resize_input=32, out_dim=8).eval()
    _randomize(model, 4)
    rs = np.random.RandomState(4)
    hint = rs.rand(1, in_ch, 32, 32).astype(np.float32)  # identity resize
    with torch.no_grad():
        want = model(torch.tensor(hint)).numpy()
    params = gn.convert_grounding_downsampler(model.state_dict(), pfx="")
    got = gn.grounding_downsampler(
        params, jnp.asarray(hint.transpose(0, 2, 3, 1)), resize_input=32,
        **kwargs)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_hed_downsampler():
    mod = _load_grounding("hed_grounding_downsampler")
    model = mod.GroundingDownsampler().eval()
    hint = np.random.RandomState(5).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(hint)).numpy()  # identity 64x64 bicubic
    got = gn.grounding_downsampler_hed(jnp.asarray(hint.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
