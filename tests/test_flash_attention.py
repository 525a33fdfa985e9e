"""Flash attention kernel parity vs the jnp reference (interpret mode).

Mirrors the reference repo's kernel-testing pattern: the one custom CUDA op
ships a pure-framework reference and an allclose + grad test
(reference: modules/SEEM/.../ops/test.py:34-116).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels.flash_attention import flash_attention, reference_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("s,t,n,kv,d", [
    (128, 128, 4, 4, 32),     # square causal, MHA
    (100, 100, 4, 4, 32),     # non-multiple of block
    (64, 256, 8, 2, 32),      # GQA + chunk with offset
])
def test_forward_parity(s, t, n, kv, d):
    b = 2
    q = _rand((b, s, n, d), 0)
    k = _rand((b, t, kv, d), 1)
    v = _rand((b, t, kv, d), 2)
    q_offset = t - s
    kv_mask = jnp.asarray(np.random.RandomState(3).rand(b, t) > 0.2)
    # ensure at least the first key is visible so no q row is fully masked
    kv_mask = kv_mask.at[:, 0].set(True)
    want = reference_attention(q, k, v, kv_mask=kv_mask, q_offset=q_offset)
    got = flash_attention(q, k, v, kv_mask=kv_mask, q_offset=q_offset,
                          block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_no_mask_defaults():
    q = _rand((1, 64, 2, 16), 0)
    k = _rand((1, 64, 2, 16), 1)
    v = _rand((1, 64, 2, 16), 2)
    want = reference_attention(q, k, v, q_offset=0)
    got = flash_attention(q, k, v, q_offset=0, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_traced_q_offset():
    """q_offset arrives as a traced scalar in the cached-decode path."""
    q = _rand((1, 32, 2, 16), 0)
    k = _rand((1, 128, 2, 16), 1)
    v = _rand((1, 128, 2, 16), 2)
    kv_mask = jnp.ones((1, 128), bool)

    def f(off):
        return flash_attention(q, k, v, kv_mask=kv_mask, q_offset=off,
                               block_q=16, block_k=32, interpret=True)

    got = jax.jit(f)(jnp.asarray(64, jnp.int32))
    want = reference_attention(q, k, v, kv_mask=kv_mask, q_offset=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_grad_matches_reference():
    q = _rand((1, 32, 2, 16), 0)
    k = _rand((1, 32, 2, 16), 1)
    v = _rand((1, 32, 2, 16), 2)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, q_offset=0, block_q=16, block_k=16)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v, q_offset=0)
        return jnp.sum(o * o)

    # custom_vjp backward is defined via the reference; forward here uses the
    # non-interpret path only for tracing the vjp structure — evaluate grads
    # against reference grads for identical values.
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # grad through the flash custom_vjp: forward runs the kernel; on CPU we
    # must run in interpret mode, so check the interpret forward + manual vjp
    out, vjp = jax.vjp(
        lambda q_, k_, v_: flash_attention(
            q_, k_, v_, q_offset=0, block_q=16, block_k=16, interpret=True),
        q, k, v)
    # interpret path bypasses custom_vjp (pure forward); compare reference vjp
    want_out, ref_vjp = jax.vjp(
        lambda q_, k_, v_: reference_attention(q_, k_, v_, q_offset=0), q, k, v)
    g = jnp.ones_like(out)
    got_grads = vjp(g)
    want_grads = ref_vjp(g)
    for a, b in zip(got_grads, want_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("s,t,n,kv,d", [
    (48, 48, 4, 4, 16),     # square, non-block-multiple
    (32, 64, 4, 2, 16),     # GQA + cached offset
])
def test_pallas_backward_parity(s, t, n, kv, d):
    """The Pallas two-pass backward (dq/dk/dv from recomputed blockwise
    probabilities + saved LSE) vs reference grads, incl. GQA head
    reduction, kv masking, and padded block tails."""
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, s, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, t, kv, d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, t, kv, d).astype(np.float32))
    kv_mask = jnp.asarray(rs.rand(2, t) > 0.2)
    kv_mask = kv_mask.at[:, :4].set(True)  # no fully-masked early rows
    off = t - s

    def loss_flash(q_, k_, v_):
        o = flash_attention(q_, k_, v_, kv_mask=kv_mask, q_offset=off,
                            block_q=32, block_k=32, interpret=True)
        return jnp.sum(o * jnp.cos(jnp.arange(d, dtype=jnp.float32)))

    def loss_ref(q_, k_, v_):
        o = reference_attention(q_, k_, v_, kv_mask=kv_mask, q_offset=off)
        return jnp.sum(o * jnp.cos(jnp.arange(d, dtype=jnp.float32)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("s,d", [
    (96, 40),      # SD UNet head dim, block-padded N
    (64, 32),      # exact block multiple
])
def test_noncausal_parity(s, d):
    """causal=False (diffusion spatial self-attention): full attention,
    forward + grads, incl. the maskless fast path and padded key tails."""
    b, n = 2, 4
    q = _rand((b, s, n, d), 10) * 0.3
    k = _rand((b, s, n, d), 11) * 0.3
    v = _rand((b, s, n, d), 12) * 0.3

    def loss_flash(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=False,
                            block_q=32, block_k=32, interpret=True)
        return jnp.sum(o * jnp.sin(jnp.arange(d, dtype=jnp.float32)))

    def loss_ref(q_, k_, v_):
        o = reference_attention(q_, k_, v_, causal=False)
        return jnp.sum(o * jnp.sin(jnp.arange(d, dtype=jnp.float32)))

    got = flash_attention(q, k, v, causal=False, block_q=32, block_k=32,
                          interpret=True)
    want = reference_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_static_shift_softmax():
    """softmax_shift (static-shift softmax) matches the reference exactly
    up to rounding, including with a kv mask and padded tails."""
    b, s, n, d = 2, 96, 4, 40
    q = _rand((b, s, n, d), 20) * 0.3
    k = _rand((b, s, n, d), 21) * 0.3
    v = _rand((b, s, n, d), 22) * 0.3
    kv_mask = jnp.asarray(np.random.RandomState(23).rand(b, s) > 0.3)
    kv_mask = kv_mask.at[:, 0].set(True)
    for mask in (None, kv_mask):
        want = reference_attention(q, k, v, kv_mask=mask, causal=False)
        got = flash_attention(q, k, v, kv_mask=mask, causal=False,
                              softmax_shift=0.0, block_q=32, block_k=32,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    # grads still flow (backward uses the saved LSE; shift folds into it)
    g = jax.grad(lambda q_: jnp.sum(flash_attention(
        q_, k, v, causal=False, softmax_shift=0.0,
        block_q=32, block_k=32, interpret=True) ** 2))(q)
    gr = jax.grad(lambda q_: jnp.sum(reference_attention(
        q_, k, v, causal=False) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_nonpower_blocks_720_geometry():
    """The video UNet's 720-token spatial sites use the exact blocks
    _flash_blocks picks: non-power-of-two block_q=360 (720/2, zero q
    padding) with a padded final k block (720 -> 768 at block_k=128),
    non-causal + static-shift softmax — the serving configuration, at the
    real sequence length (1 head, small d, interpret mode)."""
    from vitron_tpu.models.diffusion.layers import _flash_blocks

    bq, bk = _flash_blocks(720, 720)
    assert (bq, bk) == (360, 128)
    b, s, n, d = 1, 720, 1, 8
    q = _rand((b, s, n, d), 30) * 0.3
    k = _rand((b, s, n, d), 31) * 0.3
    v = _rand((b, s, n, d), 32) * 0.3
    want = reference_attention(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal=False, softmax_shift=0.0,
                          block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # single padded k block (block_k >= t): one-pass, no online accumulation
    got1 = flash_attention(q, k, v, causal=False, softmax_shift=0.0,
                           block_q=bq, block_k=768, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_blocks_policy_1024():
    """r5: 1024x1024 blocks at the SD 4096-token sites measured 0.593 ms
    vs 0.984 at 512x512 (4x4 grid amortizes per-block overhead at D=40);
    the picker prefers them whenever they divide, and keeps the zero-pad
    divisor rule elsewhere."""
    from vitron_tpu.models.diffusion.layers import _flash_blocks

    assert _flash_blocks(4096, 4096) == (1024, 1024)
    assert _flash_blocks(1024, 1024) == (1024, 1024)
    assert _flash_blocks(2048, 512) == (1024, 512)
    assert _flash_blocks(720, 720) == (360, 128)   # unchanged video sites
    assert _flash_blocks(180, 180) == (184, 128)  # padded to 8-multiple
