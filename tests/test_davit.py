"""DaViT backbone parity vs the vendored reference (via shims)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import torch_shims
from tests.conftest import load_reference_package_module
from vitron_tpu.models.seem import davit

torch = pytest.importorskip("torch")
torch_shims.install()


def test_davit_parity():
    ref_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.backbone.davit")
    torch.manual_seed(0)
    ref = ref_mod.DaViT(
        depths=(1, 1), embed_dims=(16, 32), num_heads=(2, 4),
        num_groups=(2, 4), patch_size=(7, 2), patch_stride=(4, 2),
        patch_padding=(3, 0), patch_prenorm=(False, False), window_size=4,
        drop_path_rate=0.0, out_indices=[0, 1])
    ref.eval()

    cfg = davit.DaViTConfig.tiny()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, davit.convert_torch(sd, cfg))

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        outs = ref.forward_features(torch.tensor(x))
    got = davit.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, k in enumerate(sorted(outs.keys())):
        np.testing.assert_allclose(
            np.asarray(got[i]).transpose(0, 3, 1, 2), outs[k].numpy(),
            rtol=3e-4, atol=3e-4)


def test_davit_nondivisible_window():
    """Feature sizes that don't divide the window exercise the pad path."""
    ref_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.backbone.davit")
    torch.manual_seed(1)
    ref = ref_mod.DaViT(
        depths=(1, 1), embed_dims=(16, 32), num_heads=(2, 4),
        num_groups=(2, 4), patch_size=(7, 2), patch_stride=(4, 2),
        patch_padding=(3, 0), patch_prenorm=(False, False), window_size=4,
        drop_path_rate=0.0, out_indices=[0, 1])
    ref.eval()
    cfg = davit.DaViTConfig.tiny()
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, davit.convert_torch(sd, cfg))
    x = np.random.RandomState(1).randn(1, 3, 40, 40).astype(np.float32)
    with torch.no_grad():
        outs = ref.forward_features(torch.tensor(x))
    got = davit.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, k in enumerate(sorted(outs.keys())):
        np.testing.assert_allclose(
            np.asarray(got[i]).transpose(0, 3, 1, 2), outs[k].numpy(),
            rtol=3e-4, atol=3e-4)
