"""Diffusion samplers as lax.scan loops: DDIM, PLMS, DPM-Solver++(2M).

Step math replicated from the reference exactly:
- beta schedules / DDIM arrays: modules/GLIGEN/demo/gligen/ldm/modules/
  diffusionmodules/util.py:30-83 and ldm/models/diffusion/ddpm.py:11-55
- PLMS (Adams-Bashforth up to 4th order + Heun first step):
  ldm/models/diffusion/plms.py:118-178
- gated-attention alpha schedule: task_grounded_generation.py:23-55
- DPM-Solver++(2M) (ZeroScope's DPMSolverMultistepScheduler, app.py:233)

The denoiser is a caller-supplied `eps_fn(x, t, gate_scale) -> eps` closure;
classifier-free guidance, grounding tokens, inpainting streams etc. live in
the closure so every sampler is one compiled scan regardless of pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- schedules

def make_beta_schedule(schedule: str, n_timestep: int, linear_start=1e-4,
                       linear_end=2e-2, cosine_s=8e-3) -> np.ndarray:
    if schedule == "linear":
        # ldm 'linear' is sqrt-space linear (util.py:31-34)
        return (np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                            dtype=np.float64) ** 2)
    if schedule == "sqrt_linear":
        return np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    if schedule == "cosine":
        t = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s) / (1 + cosine_s)
        alphas = np.cos(t * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, 0, 0.999)
    raise ValueError(schedule)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale so the final alphas_cumprod is exactly 0 (Lin et al.), as the
    i2vgen/t2v configs request (schedules.py:121-143, i2vgen_xl_train.yaml:
    zero_terminal_snr). Requires a v-prediction model."""
    alphas_bar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt ** 2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    betas: np.ndarray
    alphas_cumprod: np.ndarray

    @staticmethod
    def create(schedule: str = "linear", timesteps: int = 1000,
               linear_start: float = 0.00085, linear_end: float = 0.012,
               zero_terminal_snr: bool = False) -> "DiffusionSchedule":
        betas = make_beta_schedule(schedule, timesteps, linear_start, linear_end)
        if zero_terminal_snr and betas.max() != 1.0:
            betas = rescale_zero_terminal_snr(betas)
        return DiffusionSchedule(betas, np.cumprod(1.0 - betas))

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward diffusion (ldm.py:19-22)."""
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)[t]
        while ac.ndim < x0.ndim:
            ac = ac[..., None]
        return jnp.sqrt(ac) * x0 + jnp.sqrt(1.0 - ac) * noise


def make_ddim_arrays(sched: DiffusionSchedule, num_steps: int, eta: float = 0.0):
    """Uniform timestep subset + per-step alphas (util.py:55-83).

    Returns (timesteps[S] ascending, alphas[S], alphas_prev[S], sigmas[S])."""
    if sched.num_timesteps % num_steps:
        raise ValueError(
            f"num_steps={num_steps} must divide num_timesteps="
            f"{sched.num_timesteps} (ldm uniform discretization, util.py:56-58)")
    c = sched.num_timesteps // num_steps
    ts = np.asarray(list(range(0, sched.num_timesteps, c))) + 1
    ac = sched.alphas_cumprod
    alphas = ac[ts]  # ts are the +1-shifted ldm indices (util.py:66,74)
    alphas_prev = np.concatenate([[ac[0]], alphas[:-1]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return ts, alphas.astype(np.float32), alphas_prev.astype(np.float32), sigmas.astype(np.float32)


def alpha_generator(length: int, typ: Sequence[float] = (1.0, 0.0, 0.0)) -> np.ndarray:
    """Gated-attention annealing schedule (task_grounded_generation.py:23-55):
    stage of alpha=1, linear decay stage, alpha=0 stage."""
    assert abs(sum(typ) - 1.0) < 1e-6
    s0 = int(typ[0] * length)
    s1 = int(typ[1] * length)
    s2 = length - s0 - s1
    decay = list(np.arange(0, 1, 1.0 / s1)[::-1]) if s1 else []
    return np.asarray([1.0] * s0 + decay + [0.0] * s2, np.float32)


# ----------------------------------------------------------------- DDIM

def _x_prev(x, e_t, a_t, a_prev, sigma, noise):
    """get_x_prev_and_pred_x0 (plms.py:139-155)."""
    pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma ** 2) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise, pred_x0


def ddim_sample(
    eps_fn: Callable,
    x: jax.Array,
    sched: DiffusionSchedule,
    num_steps: int,
    rng: Optional[jax.Array] = None,
    eta: float = 0.0,
    gate_alphas: Optional[np.ndarray] = None,
    mask_blend: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """DDIM descending-time loop. mask_blend=(mask, x0) reproduces the
    per-step inpainting composite (plms.py:103-113): keep x0's noised
    content where mask==1."""
    ts, alphas, alphas_prev, sigmas = make_ddim_arrays(sched, num_steps, eta)
    order = np.arange(num_steps)[::-1]  # descending time
    steps = jnp.asarray(ts[order])
    a_t = jnp.asarray(alphas[order])
    a_prev = jnp.asarray(alphas_prev[order])
    sig = jnp.asarray(sigmas[order])
    gates = jnp.asarray(gate_alphas[np.arange(num_steps)] if gate_alphas is not None
                        else np.ones(num_steps, np.float32))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(rng, num_steps)

    def step(carry, inp):
        x = carry
        t, at, ap, s, gate, key = inp
        if mask_blend is not None:
            mask, x0 = mask_blend
            k1, key = jax.random.split(key)
            x_orig = sched.q_sample(x0, t, jax.random.normal(k1, x0.shape, x0.dtype))
            x = x_orig * mask + (1.0 - mask) * x
        e_t = eps_fn(x, t, gate)
        noise = jax.random.normal(key, x.shape, x.dtype)
        x, _ = _x_prev(x, e_t, at, ap, s, noise)
        return x, None

    x, _ = jax.lax.scan(step, x, (steps, a_t, a_prev, sig, gates, keys))
    return x


def ddim_sample_v(
    v_fn: Callable,
    x: jax.Array,
    sched: DiffusionSchedule,
    num_steps: int,
    rng: Optional[jax.Array] = None,
    eta: float = 0.0,
    percentile: Optional[float] = None,
) -> jax.Array:
    """DDIM loop for a v-prediction model — the i2vgen/t2v inference path
    (reference diffusion_ddim.py:206-253, mean_type='v'):

      steps = (1 + arange(0, T, T//S)).clamp(0, T-1), descending;
      x0    = sqrt(ac_t) x - sqrt(1-ac_t) v       (p_mean_variance:190-193)
      eps   = (sqrt(1/ac_t) x - x0) / sqrt(1/ac_t - 1)
      x_{t-stride} = sqrt(ac_prev) x0 + sqrt(1-ac_prev-sigma^2) eps [+ noise]

    `percentile` reproduces the dynamic x0 clamp (p_mean_variance:196-199).
    v_fn(x, t) must already fold in classifier-free guidance.
    """
    T = sched.num_timesteps
    stride = T // num_steps
    steps = np.clip(1 + np.arange(0, T, stride), 0, T - 1)[::-1].copy()
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    a_t = jnp.asarray(ac[steps], jnp.float32)
    a_prev = jnp.asarray(ac[np.clip(steps - stride, 0, None)], jnp.float32)
    sig = jnp.asarray(
        eta * np.sqrt((1 - ac[np.clip(steps - stride, 0, None)]) / (1 - ac[steps])
                      * (1 - ac[steps] / ac[np.clip(steps - stride, 0, None)])),
        jnp.float32)
    nonzero = jnp.asarray((steps != 0).astype(np.float32))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(rng, len(steps))

    def step(carry, inp):
        x = carry
        t, at, ap, s, nz, key = inp
        v = v_fn(x, t)
        x0 = jnp.sqrt(at) * x - jnp.sqrt(1.0 - at) * v
        if percentile is not None:
            flat = jnp.abs(x0.reshape(x0.shape[0], -1))
            q = jnp.quantile(flat.astype(jnp.float32), percentile, axis=1)
            q = jnp.maximum(q, 1.0).reshape((-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -q, q) / q
        eps_hat = (jnp.sqrt(1.0 / at) * x - x0) / jnp.sqrt(1.0 / at - 1.0)
        noise = jax.random.normal(key, x.shape, x.dtype)
        direction = jnp.sqrt(1.0 - ap - s ** 2) * eps_hat
        x = jnp.sqrt(ap) * x0 + direction + nz * s * noise
        return x, None

    x, _ = jax.lax.scan(step, x, (jnp.asarray(steps), a_t, a_prev, sig,
                                  nonzero, keys))
    return x


# ----------------------------------------------------------------- PLMS

def plms_sample(
    eps_fn: Callable,
    x: jax.Array,
    sched: DiffusionSchedule,
    num_steps: int,
    rng: Optional[jax.Array] = None,
    gate_alphas: Optional[np.ndarray] = None,
    mask_blend: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """PLMS (plms.py:70-178): Heun for the first step, then Adams-Bashforth
    of increasing order over the last <=3 eps estimates."""
    ts, alphas, alphas_prev, sigmas = make_ddim_arrays(sched, num_steps, 0.0)
    order = np.arange(num_steps)[::-1]
    steps = ts[order]
    t_next = np.concatenate([steps[1:], steps[-1:]])
    a_t = jnp.asarray(alphas[order])
    a_prev = jnp.asarray(alphas_prev[order])
    gates = jnp.asarray(gate_alphas[np.arange(num_steps)] if gate_alphas is not None
                        else np.ones(num_steps, np.float32))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(rng, num_steps)
    zero = jnp.zeros((), x.dtype)

    def blend(x, t, key):
        if mask_blend is None:
            return x
        mask, x0 = mask_blend
        x_orig = sched.q_sample(x0, t, jax.random.normal(key, x0.shape, x0.dtype))
        return x_orig * mask + (1.0 - mask) * x

    def step(carry, inp):
        x, old_eps, n_old = carry
        i, key = inp
        t = jnp.asarray(steps)[i]
        tn = jnp.asarray(t_next)[i]
        at, ap, gate = a_t[i], a_prev[i], gates[i]
        k1, k2 = jax.random.split(key)
        x = blend(x, t, k1)
        e_t = eps_fn(x, t, gate)

        def heun(_):
            x_prev, _ = _x_prev(x, e_t, at, ap, zero, zero)
            e_t_next = eps_fn(x_prev, tn, gate)
            return (e_t + e_t_next) / 2

        def ab2(_):
            return (3 * e_t - old_eps[2]) / 2

        def ab3(_):
            return (23 * e_t - 16 * old_eps[2] + 5 * old_eps[1]) / 12

        def ab4(_):
            return (55 * e_t - 59 * old_eps[2] + 37 * old_eps[1] - 9 * old_eps[0]) / 24

        e_t_prime = jax.lax.switch(jnp.minimum(n_old, 3), [heun, ab2, ab3, ab4], None)
        x_new, _ = _x_prev(x, e_t_prime, at, ap, zero, zero)
        old_eps = jnp.stack([old_eps[1], old_eps[2], e_t])
        return (x_new, old_eps, n_old + 1), None

    old0 = jnp.stack([jnp.zeros_like(x)] * 3)
    (x, _, _), _ = jax.lax.scan(
        step, (x, old0, jnp.zeros((), jnp.int32)),
        (jnp.arange(num_steps), keys))
    return x


# ----------------------------------------------------------------- DPM-Solver++

def dpm_solver_pp_2m(
    eps_fn: Callable,
    x: jax.Array,
    sched: DiffusionSchedule,
    num_steps: int,
    gate_alphas: Optional[np.ndarray] = None,
) -> jax.Array:
    """DPM-Solver++(2M) multistep, eps-prediction, final x0 output —
    the scheduler ZeroScope runs 50 steps of (diffusers
    DPMSolverMultistepScheduler; reference app.py:228-236)."""
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    T = sched.num_timesteps
    # trailing uniform timesteps T-1 ... 0
    ts = np.linspace(T - 1, 0, num_steps + 1).round().astype(int)[:-1]
    alpha_t = np.sqrt(ac[ts])
    sigma_t = np.sqrt(1 - ac[ts])
    lam = np.log(alpha_t) - np.log(sigma_t)
    # boundary: lambda at t=0 (alpha ~ 1)
    alpha_prev = np.concatenate([alpha_t[1:], [1.0]])
    sigma_prev = np.concatenate([sigma_t[1:], [np.sqrt(1 - ac[0]) * 1e-3]])
    lam_prev = np.log(alpha_prev) - np.log(sigma_prev)
    gates = jnp.asarray(gate_alphas[np.arange(num_steps)] if gate_alphas is not None
                        else np.ones(num_steps, np.float32))

    arrays = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        (np.asarray(ts), alpha_t, sigma_t, lam, alpha_prev, sigma_prev, lam_prev))
    tsj, a_j, s_j, l_j, ap_j, sp_j, lp_j = arrays

    def to_x0(x, eps, a, s):
        return (x - s * eps) / a

    def step(carry, i):
        x, x0_prev, has_prev = carry
        t = tsj[i].astype(jnp.int32)
        eps = eps_fn(x, t, gates[i])
        x0 = to_x0(x, eps, a_j[i], s_j[i])
        h = lp_j[i] - l_j[i]

        def first(_):
            return x0

        def second(_):
            h_last = l_j[i] - l_j[i - 1]
            r = h_last / h
            return (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev

        x0_bar = jax.lax.cond(has_prev, second, first, None)
        x_new = (sp_j[i] / s_j[i]) * x - ap_j[i] * jnp.expm1(-h) * x0_bar
        return (x_new, x0, jnp.ones((), bool)), None

    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), jnp.zeros((), bool)), jnp.arange(num_steps))
    return x


def cfg_eps(model_fn: Callable, guidance_scale: float):
    """Classifier-free guidance wrapper: batch cond+uncond in one UNet call
    (the reference runs two sequential UNet forwards, plms.py:124-131 — one
    batched call halves the step latency)."""

    def eps(x, t, context, uc_context, gate, **kw):
        if guidance_scale == 1.0:
            return model_fn(x, t, context, gate, **kw)
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.broadcast_to(t, (xx.shape[0],)) if jnp.ndim(t) == 0 else jnp.concatenate([t, t])
        cc = jnp.concatenate([context, uc_context], axis=0)
        kw2 = {k: (jnp.concatenate([v, v], axis=0) if hasattr(v, "ndim") and v.ndim > 0 else v)
               for k, v in kw.items()}
        out = model_fn(xx, tt, cc, gate, **kw2)
        e_c, e_uc = jnp.split(out, 2, axis=0)
        return e_uc + guidance_scale * (e_c - e_uc)

    return eps
