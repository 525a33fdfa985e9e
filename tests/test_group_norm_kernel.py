"""kernels/group_norm.py: Pallas GN-stats parity + gradient.

The kernel is a gated negative result (VITRON_GN=pallas; XLA default —
see the module docstring for the e2e numbers); these tests keep it
correct so re-measurement on other hardware stays one env var away.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitron_tpu.kernels.group_norm import (_sums_pallas, _sums_xla, gn_sums,
                                           group_norm_sums)


@pytest.mark.parametrize("shape", [(3, 700, 256), (2, 2880, 512), (1, 9, 128)])
def test_pallas_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    a = np.asarray(_sums_pallas(x, interpret=True))
    b = np.asarray(_sums_xla(x))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)


def test_grad_matches_xla_vjp():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 128), jnp.float32)

    def loss(z, up):
        return jnp.sum(jnp.sin(gn_sums(z, up)))

    g_custom = jax.grad(lambda z: loss(z, False))(x)
    g_ref = jax.grad(lambda z: jnp.sum(jnp.sin(_sums_xla(z))))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_default_is_xla_on_cpu():
    x = jnp.zeros((1, 512, 512), jnp.float32)
    out = group_norm_sums(x)  # must not touch the TPU-only kernel path
    assert out.shape == (1, 2, 512) and out.dtype == jnp.float32


def test_group_norm_end_to_end_unchanged():
    from vitron_tpu.models.diffusion.layers import group_norm
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 64), jnp.float32)
    y = np.asarray(group_norm(x, jnp.ones(64), jnp.zeros(64), groups=32))
    # torch reference semantics: per-sample, per-group standardization
    xr = np.asarray(x, np.float64).reshape(2, 64, 32, 2)
    mu = xr.mean(axis=(1, 3), keepdims=True)
    sd = np.sqrt(xr.var(axis=(1, 3), keepdims=True) + 1e-6)
    ref = ((xr - mu) / sd).reshape(2, 8, 8, 64)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
