"""Fused GEGLU FF kernel (kernels/geglu_ff.py) vs the plain XLA form.

Reference semantics: GLIGEN attention.py:44-71 FeedForward(glu=True) —
Linear(C -> 2F), split, a * gelu(gate), Linear(F -> C). The kernel uses
the tanh-form gelu (no erf in Mosaic); agreement is pinned at bf16
tolerance, which dominates the tanh-vs-erf deviation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels import geglu_ff as gf


def _mats(m=1024, c=256, f=512, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = (jax.random.normal(ks[0], (m, c)) * 0.5).astype(dtype)
    pw = (jax.random.normal(ks[1], (c, 2 * f)) / np.sqrt(c)).astype(dtype)
    pb = (jax.random.normal(ks[2], (2 * f,)) * 0.1).astype(dtype)
    ow = (jax.random.normal(ks[3], (f, c)) / np.sqrt(f)).astype(dtype)
    ob = (jax.random.normal(ks[4], (c,)) * 0.1).astype(dtype)
    return x, pw, pb, ow, ob


def test_fused_matches_xla_interpret():
    args = _mats(dtype=jnp.bfloat16)
    want = gf._xla_geglu(*[a.astype(jnp.float32) for a in args])
    got = gf._geglu_ff_fwd(*args, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() <= 2e-2 * max(scale, 1.0), (err.max(), scale)


def test_fused_matches_xla_sd_geometry_interpret():
    """c=320 (the SD UNet's ds=1 FF width): C is 2.5 lane tiles — never
    blocked, so Mosaic pads; parity must hold exactly like the 128-multiple
    case (r5 gate relaxation)."""
    args = _mats(m=1024, c=320, f=1280, dtype=jnp.bfloat16)
    want = gf._xla_geglu(*[a.astype(jnp.float32) for a in args])
    got = gf._geglu_ff_fwd(*args, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() <= 2e-2 * max(scale, 1.0), (err.max(), scale)


def test_gelu_tanh_close_to_erf():
    x = jnp.linspace(-6, 6, 4001, dtype=jnp.float32)
    exact = 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))
    got = gf._gelu(x)
    assert float(jnp.abs(got - exact).max()) < 2e-3


def test_grad_matches_xla():
    args = _mats(m=512, c=128, f=512, dtype=jnp.float32)

    def loss_fused(*a):
        # custom_vjp backward recomputes via the XLA path
        return jnp.sum(gf._geglu_ff(*a) ** 2)

    def loss_xla(*a):
        return jnp.sum(gf._xla_geglu(*a) ** 2)

    # interpret path for CPU: route the fwd through interpret mode
    import functools
    orig = gf._geglu_ff_fwd
    gf_fwd = functools.partial(orig, interpret=True)
    try:
        gf._geglu_ff_fwd = gf_fwd
        g1 = jax.grad(loss_fused, argnums=(0, 1, 3))(*args)
    finally:
        gf._geglu_ff_fwd = orig
    g2 = jax.grad(loss_xla, argnums=(0, 1, 3))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_usable_gating(monkeypatch):
    x = jnp.zeros((48, 720, 1024), jnp.bfloat16)
    pw = jnp.zeros((1024, 8192), jnp.bfloat16)
    ow = jnp.zeros((4096, 1024), jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    assert gf.usable(x, pw, ow) == on_tpu
    monkeypatch.setenv("VITRON_FFN", "xla")
    assert not gf.usable(x, pw, ow)
    # f32 never routes to the kernel (parity paths stay exact)
    assert not gf.usable(x.astype(jnp.float32), pw, ow)
