"""MSDeformAttn parity + gradcheck vs a torch replica of the reference
pure-PyTorch implementation (ms_deform_attn_func.py:52-72) — the same
test shape the reference ships (ops/test.py:34-116)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels.ms_deform_attn import ms_deform_attn

torch = pytest.importorskip("torch")


def _torch_ref(value, shapes, locs, weights):
    import torch.nn.functional as F

    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = locs.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    aw = weights.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1).view(N_, M_ * D_, Lq_)
    return out.transpose(1, 2).contiguous()


def _make_inputs(seed=0, n=2, m=2, d=8, lq=6, p=4):
    shapes = [(6, 4), (3, 2)]
    s = sum(h * w for h, w in shapes)
    rs = np.random.RandomState(seed)
    value = rs.randn(n, s, m, d).astype(np.float32)
    locs = rs.rand(n, lq, m, len(shapes), p, 2).astype(np.float32)
    w = rs.rand(n, lq, m, len(shapes), p).astype(np.float32)
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, shapes, locs, w


def test_forward_parity():
    value, shapes, locs, w = _make_inputs()
    with torch.no_grad():
        want = _torch_ref(torch.tensor(value), shapes, torch.tensor(locs),
                          torch.tensor(w)).numpy()
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_out_of_bounds_zero_padding():
    value, shapes, locs, w = _make_inputs(seed=1)
    locs = locs * 3 - 1  # push many samples out of [0, 1]
    with torch.no_grad():
        want = _torch_ref(torch.tensor(value), shapes, torch.tensor(locs),
                          torch.tensor(w)).numpy()
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_grad_parity():
    """Gradients w.r.t. value, locations, weights vs torch autograd
    (the reference needed a handwritten CUDA backward + gradcheck,
    ops/test.py:60-116)."""
    value, shapes, locs, w = _make_inputs(seed=2)

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(locs, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    out = _torch_ref(tv, shapes, tl, tw)
    out.sum().backward()

    def f(v, l, wts):
        return jnp.sum(ms_deform_attn(v, shapes, l, wts))

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), rtol=1e-4, atol=1e-4)
