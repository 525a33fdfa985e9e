"""Fused frame-attention kernel (kernels/temporal_attention.py) vs the
einsum formulation of the reference TemporalTransformer / BasicTransformer
frame attention (i2vgen util.py:992-1089, 1009)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels import temporal_attention as ta


def _qkv(b=2, f=8, n=256, h=4, d=64, dtype=jnp.bfloat16, scale=0.5):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return [(jax.random.normal(k, (b, f, n, h * d)) * scale).astype(dtype)
            for k in ks]


def test_kernel_matches_einsum_interpret():
    q, k, v = _qkv()
    want = ta._xla(q, k, v, 4)
    got = ta._fwd(q, k, v, heads=4, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 3e-2, err.max()


def test_kernel_multi_head_per_lane_block():
    # h*d = 256 -> two 128-lane blocks, two heads per block
    q, k, v = _qkv(f=6, n=128, h=4, d=64)
    want = ta._xla(q, k, v, 4)
    got = ta._fwd(q, k, v, heads=4, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 3e-2, err.max()


def test_grad_matches_einsum():
    q, k, v = _qkv(b=1, f=4, n=128, h=2, d=64, dtype=jnp.float32)

    import functools
    orig = ta._fwd
    ta._fwd = functools.partial(orig, interpret=True)
    try:
        g1 = jax.grad(lambda *a: jnp.sum(ta._frame_attn(*a, 2) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    finally:
        ta._fwd = orig
    g2 = jax.grad(lambda *a: jnp.sum(ta._xla(*a, 2) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_usable_gating(monkeypatch):
    x = jnp.zeros((2, 24, 2880, 512), jnp.bfloat16)
    # measured-negative on v5e -> off unless explicitly requested
    assert not ta.usable(x, 24)
    monkeypatch.setenv("VITRON_TATTN", "fused")
    on_tpu = jax.default_backend() == "tpu"
    assert ta.usable(x, 24) == on_tpu
    # f32 and non-tileable pixel counts fall back to the einsum path
    assert not ta.usable(x.astype(jnp.float32), 24)
    assert not ta.usable(jnp.zeros((2, 24, 45, 512), jnp.bfloat16), 24)
