"""Parity + grad tests for the Pallas fused temporal k=3 conv.

Pattern follows the reference's own CUDA-op test
(modules/SEEM/demo_code/xdecoder/body/encoder/ops/test.py:34-116):
kernel vs jnp reference, forward allclose + gradient parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitron_tpu.kernels import temporal_conv as tc


def reference(x, w):
    """Direct frame-window sum in f32."""
    b, f, n, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (0, 0), (0, 0)))
    w32 = w.astype(jnp.float32)
    return sum(jnp.einsum("bfnc,cd->bfnd", xp[:, d:d + f], w32[d])
               for d in range(3)).astype(x.dtype)


CASES = [
    (2, 4, 16, 32, 32),    # (B, F, N, C, Co)
    (1, 6, 24, 64, 48),
    (1, 3, 10, 16, 16),
]


@pytest.mark.parametrize("b,f,n,c,co", CASES)
def test_pallas_parity(b, f, n, c, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, f, n, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, c, co)) * 0.1, jnp.float32)
    got = tc._tconv_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(reference(x, w)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,f,n,c,co", CASES[:2])
def test_xla_parity(b, f, n, c, co):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, f, n, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, c, co)) * 0.1, jnp.float32)
    got = tc.temporal_conv_k3(x, w, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(reference(x, w)),
                               rtol=1e-4, atol=1e-4)


def test_torch_weight_layout_and_bias_and_5d():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 1, 32, 24)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((24,)), jnp.float32)
    got = tc.temporal_conv_k3(x, w, bias, use_pallas=False)
    want = reference(x.reshape(1, 4, 48, 32), w[:, 0]).reshape(1, 4, 6, 8, 24) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_grad_parity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 5, 12, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 32, 32)) * 0.1, jnp.float32)

    def loss_k(x, w):
        return jnp.sum(jnp.sin(tc.temporal_conv_k3(x, w, use_pallas=False)))

    def loss_r(x, w):
        return jnp.sum(jnp.sin(reference(x, w)))

    gx, gw = jax.grad(loss_k, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_bf16():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 128, 128)) * 0.1, jnp.bfloat16)
    got = tc._tconv_pallas(x, w, interpret=True)
    want = reference(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=5e-2, atol=5e-2)


def test_concat_mode_matches_shift_matmul():
    """VITRON_TCONV=concat single-dot form == the shift-matmul form."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.kernels.temporal_conv import _tconv

    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(ks[0], (2, 6, 40, 32))
    w = jax.random.normal(ks[1], (3, 32, 48)) * 0.1
    a = _tconv(x, w, "xla")
    b = _tconv(x, w, "concat")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda x, w: jnp.sum(_tconv(x, w, "concat") ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(_tconv(x, w, "xla") ** 2),
                  argnums=(0, 1))(x, w)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-4)


def test_w8a8_temporal_conv_matches_f32():
    """Quantized {"q8t","s"} taps through temporal_conv_k3 track the f32
    shift-matmul within int8 tolerance."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.kernels.quantization import quantize_tconv
    from vitron_tpu.kernels.temporal_conv import temporal_conv_k3

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (2, 6, 5, 8, 32))
    w = jax.random.normal(ks[1], (3, 1, 32, 48)) * 0.1
    bias = jax.random.normal(ks[2], (48,)) * 0.1
    want = temporal_conv_k3(x, w, bias)
    got = temporal_conv_k3(x, quantize_tconv(w), bias)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel
