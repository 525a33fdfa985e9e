"""Diffusion training losses.

Rebuilds the i2vgen-xl training objectives (reference:
modules/i2vgen-xl/tools/modules/diffusions/diffusion_ddim.py:367-443):
MSE / L1 / charbonnier on eps / x0 / v targets, optional per-sample
weighting, and the temporal-diversity regularizer ("div loss") that
penalizes collapsed frame variance for eps-prediction video models.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from vitron_tpu.models.diffusion.samplers import DiffusionSchedule


def _gather(a, t, ndim):
    v = jnp.asarray(a, jnp.float32)[t]
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def diffusion_loss(
    model_fn: Callable,          # (x_t [B,...], t [B]) -> prediction
    x0: jax.Array,               # [B, T, H, W, C] (video) or [B, H, W, C]
    t: jax.Array,                # [B] int32
    rng: jax.Array,
    sched: DiffusionSchedule,
    mean_type: str = "eps",      # 'eps' | 'x0' | 'v'
    loss_type: str = "mse",      # 'mse' | 'l1' | 'charbonnier'
    weight: Optional[jax.Array] = None,
    use_div_loss: bool = False,
    charbonnier_eps: float = 1e-6,
) -> jax.Array:
    """Per-sample loss [B] (diffusion_ddim.py:367-421)."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    ac = jnp.asarray(sched.alphas_cumprod, jnp.float32)
    sqrt_ac = _gather(jnp.sqrt(ac), t, x0.ndim)
    sqrt_1mac = _gather(jnp.sqrt(1 - ac), t, x0.ndim)
    xt = sqrt_ac * x0 + sqrt_1mac * noise

    out = model_fn(xt, t)
    target = {
        "eps": noise,
        "x0": x0,
        "v": sqrt_ac * noise - sqrt_1mac * x0,
    }[mean_type]

    diff = (out - target).astype(jnp.float32)
    if loss_type == "mse":
        per = jnp.mean(diff ** 2, axis=tuple(range(1, diff.ndim)))
    elif loss_type == "l1":
        per = jnp.mean(jnp.abs(diff), axis=tuple(range(1, diff.ndim)))
    elif loss_type == "charbonnier":
        per = jnp.mean(jnp.sqrt(diff ** 2 + charbonnier_eps),
                       axis=tuple(range(1, diff.ndim)))
    else:
        raise ValueError(loss_type)
    if weight is not None:
        per = per * weight

    if use_div_loss and mean_type == "eps" and x0.ndim == 5 and x0.shape[1] > 1:
        # derive x0 from the eps prediction, penalize low frame-to-frame std
        # (diffusion_ddim.py:404-417); frames are axis 1 here (NTHWC)
        sqrt_recip = _gather(jnp.sqrt(1.0 / ac), t, x0.ndim)
        sqrt_recipm1 = _gather(jnp.sqrt(1.0 / ac - 1.0), t, x0.ndim)
        x0_hat = sqrt_recip * xt - sqrt_recipm1 * out
        frame_std = jnp.std(x0_hat.astype(jnp.float32), axis=1)
        div = 0.001 / (jnp.mean(frame_std.reshape(frame_std.shape[0], -1), axis=1) + 1e-4)
        per = per + div
    return per


def v_to_eps(v: jax.Array, xt: jax.Array, t: jax.Array,
             sched: DiffusionSchedule) -> jax.Array:
    """Convert a v-prediction to eps (for samplers that consume eps)."""
    ac = jnp.asarray(sched.alphas_cumprod, jnp.float32)
    sa = _gather(jnp.sqrt(ac), t, xt.ndim)
    sb = _gather(jnp.sqrt(1 - ac), t, xt.ndim)
    return sa * v + sb * xt
