"""Multi-chip video UNet sharding: (cfg, frames)-sharded step == unsharded.

Runs on the 8-device virtual CPU mesh (tests/conftest.py); the driver's
dryrun_multichip exercises the same path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.distributed import video_sharding as vs
from vitron_tpu.models.diffusion import unet_sd_video


@pytest.fixture(scope="module")
def tiny():
    cfg = unet_sd_video.UNetSDVideoConfig.tiny("t2v")
    params = unet_sd_video.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_mesh_factorization():
    mesh = vs.create_video_mesh(8)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"cfg": 2, "frames": 4}
    mesh3 = vs.create_video_mesh(3)
    assert dict(zip(mesh3.axis_names, mesh3.devices.shape)) == \
        {"cfg": 1, "frames": 3}


def test_sharded_step_matches_dense(tiny):
    cfg, params = tiny
    mesh = vs.create_video_mesh(8)
    b, f, h, w = 2, 8, 8, 8  # F=8 divides the 4-way frame axis
    x = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4))
    t = jnp.full((b,), 3.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 7, 1024)) * 0.02

    def step(params, x, t, ctx):
        return unet_sd_video.forward(params, cfg, x, t, y=ctx)

    dense = step(params, x, t, ctx)
    sharded_step = vs.shard_video_step(step, mesh)
    out = sharded_step(params, x, t, ctx)
    assert out.sharding.is_equivalent_to(vs.video_in_shardings(mesh), 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.nightly
def test_sharded_step_cfg_only_mesh(tiny):
    """Odd device counts fall back to frames-only sharding."""
    cfg, params = tiny
    mesh = vs.create_video_mesh(4, cfg_parallel=False)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"cfg": 1, "frames": 4}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 4))
    t = jnp.full((2,), 5.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 1024)) * 0.02

    def step(params, x, t, ctx):
        return unet_sd_video.forward(params, cfg, x, t, y=ctx)

    dense = step(params, x, t, ctx)
    out = vs.shard_video_step(step, mesh)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)
