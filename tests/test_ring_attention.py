"""Ring attention over an 8-device CPU context axis vs full attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.core.mesh import create_mesh
from vitron_tpu.distributed.ring_attention import ring_attention
from vitron_tpu.kernels.flash_attention import reference_attention


@pytest.fixture(scope="module")
def ctx_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh({"context": 8})


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(ctx_mesh, causal):
    b, s, n, d = 2, 64, 4, 16
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    got = ring_attention(q, k, v, ctx_mesh, causal=causal)
    if causal:
        want = reference_attention(q, k, v, q_offset=0)
    else:
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / np.sqrt(d)
        probs = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum("bnqk,bknd->bqnd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ring_under_jit(ctx_mesh):
    b, s, n, d = 1, 32, 2, 8
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))

    @jax.jit
    def f(q):
        return ring_attention(q, q, q, ctx_mesh, causal=True)

    out = f(q)
    want = reference_attention(q, q, q, q_offset=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
