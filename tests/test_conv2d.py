"""Pallas 3x3 conv kernel: parity vs lax.conv (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels.conv2d import conv3x3_same


def _ref(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("shape", [(1, 8, 16, 128, 128), (2, 6, 8, 128, 256)])
def test_conv3x3_parity_interpret(shape):
    bs, h, w_, c, d = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(bs, h, w_, c), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, c, d) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(d) * 0.1, jnp.float32)
    got = conv3x3_same(x, w, b, interpret=True)
    want = _ref(x, w, b)
    # the kernel computes taps in bf16 (f32 accumulation), like XLA's own
    # TPU conv path; compare at bf16 tolerance relative to the output scale
    scale = float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale,
                               rtol=0, atol=6e-3)


def test_conv3x3_fallback_small_channels():
    """Channel counts below the lane width fall back to lax.conv."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    got = conv3x3_same(x, w)
    want = _ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_grads_match_lax():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 6, 8, 128), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 128, 128) * 0.05, jnp.float32)

    def loss_k(x, w):
        return jnp.sum(conv3x3_same(x, w, interpret=True) ** 2)

    def loss_r(x, w):
        return jnp.sum(_ref(x, w) ** 2)

    gx_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, w)
    for gk, gr in ((gx_k, gx_r), (gw_k, gw_r)):
        gk, gr = np.asarray(gk), np.asarray(gr)
        scale = np.abs(gr).max()
        np.testing.assert_allclose(gk / scale, gr / scale, rtol=0, atol=2e-2)
