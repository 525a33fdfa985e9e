"""Parity + grad tests for the Pallas depthwise conv kernel.

Pattern follows the reference's own CUDA-op test
(modules/SEEM/demo_code/xdecoder/body/encoder/ops/test.py:34-116):
kernel vs pure-jnp reference, forward allclose + gradient parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitron_tpu.kernels import depthwise_conv as dw


CASES = [
    # (B, H, W, C, k) — FocalNet stage shapes (scaled), DaViT 3x3, ConvNeXt 7x7
    (2, 16, 16, 128, 3),
    (1, 32, 24, 192, 9),
    (2, 8, 8, 64, 5),
    (1, 24, 40, 256, 7),
    (1, 13, 17, 96, 3),   # H not divisible by the row block, odd W
]


def _case(seed, b, h, w, c, k, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    wgt = jnp.asarray(rng.standard_normal((k, k, c)) * 0.2, dtype)
    return x, wgt


@pytest.mark.parametrize("b,h,w,c,k", CASES)
def test_pallas_kernel_parity(b, h, w, c, k):
    x, wgt = _case(0, b, h, w, c, k)
    got = dw._dw_pallas(x, wgt, interpret=True)
    want = dw.reference(x, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,h,w,c,k", CASES[:3])
def test_xla_path_parity(b, h, w, c, k):
    x, wgt = _case(1, b, h, w, c, k)
    got = dw.depthwise_conv2d(x, wgt, use_pallas=False)
    want = dw.reference(x, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bias_and_hwio_weight():
    x, wgt = _case(2, 1, 8, 8, 32, 3)
    bias = jnp.asarray(np.random.default_rng(3).standard_normal((32,)), jnp.float32)
    got = dw.depthwise_conv2d(x, wgt[:, :, None, :], bias, use_pallas=False)
    want = dw.reference(x, wgt) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_grad_parity():
    x, wgt = _case(4, 1, 12, 10, 64, 5)

    def loss_kernel(x, w):
        return jnp.sum(jnp.sin(dw.depthwise_conv2d(x, w, use_pallas=False)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(dw.reference(x, w)))

    gx, gw = jax.grad(loss_kernel, argnums=(0, 1))(x, wgt)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_bf16():
    x, wgt = _case(5, 1, 16, 16, 128, 3, jnp.bfloat16)
    got = dw._dw_pallas(x, wgt, interpret=True)
    want = dw.reference(x, wgt)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2, atol=2e-2)
