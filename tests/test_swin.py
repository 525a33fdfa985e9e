"""Swin backbone parity vs the vendored Microsoft Swin (via shims)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import load_reference_package_module
from vitron_tpu.models.seem import swin

torch = pytest.importorskip("torch")
torch_shims.install()


@pytest.fixture(scope="module")
def ref_swin():
    return load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.backbone.swin")


def test_swin_parity(ref_swin):
    torch.manual_seed(0)
    ref = ref_swin.SwinTransformer(
        pretrain_img_size=32, patch_size=4, embed_dim=16, depths=(1, 2),
        num_heads=(2, 4), window_size=4, mlp_ratio=4.0, qkv_bias=True,
        ape=False, patch_norm=True, out_indices=(0, 1), frozen_stages=-1,
        use_checkpoint=False)
    ref.eval()  # train() override may return None

    cfg = swin.SwinConfig.tiny()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, swin.convert_torch(sd, cfg))

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        outs = ref(torch.tensor(x))
    got = swin.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    keys = sorted(outs.keys())
    for i, k in enumerate(keys):
        np.testing.assert_allclose(
            np.asarray(got[i]).transpose(0, 3, 1, 2), outs[k].numpy(),
            rtol=3e-4, atol=3e-4)


def test_swin_parity_nondivisible(ref_swin):
    """Inputs whose feature maps don't divide the window exercise the
    padding path + padded shift masks."""
    torch.manual_seed(1)
    ref = ref_swin.SwinTransformer(
        pretrain_img_size=40, patch_size=4, embed_dim=16, depths=(1, 2),
        num_heads=(2, 4), window_size=4, mlp_ratio=4.0, qkv_bias=True,
        ape=False, patch_norm=True, out_indices=(0, 1), frozen_stages=-1)
    ref.eval()
    cfg = swin.SwinConfig.tiny()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, swin.convert_torch(sd, cfg))
    x = np.random.RandomState(1).randn(1, 3, 40, 40).astype(np.float32)
    with torch.no_grad():
        outs = ref(torch.tensor(x))
    got = swin.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, k in enumerate(sorted(outs.keys())):
        np.testing.assert_allclose(
            np.asarray(got[i]).transpose(0, 3, 1, 2), outs[k].numpy(),
            rtol=3e-4, atol=3e-4)
