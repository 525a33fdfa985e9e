"""Video-diffusion fine-tuning for the UNetSD family (T2V / I2VGen).

Rebuilds the reference's t2v training entry
(reference: modules/i2vgen-xl/tools/train/train_t2v_enterance.py:123-290):
AdamW + the AnnealingLR warmup/cosine schedule
(utils/optim/lr_scheduler.py:6-43), v-prediction diffusion loss with optional
divergence regularizer (tools/modules/diffusions/diffusion_ddim.py:367-443),
classifier-free text dropout (``p_zero``, train_t2v_enterance.py:222-226),
gradient value clipping (``clip_grad_value_(…, 0.05)``, :246), and an EMA of
the weights updated as ``ema = model.lerp(ema, decay)`` (:258-262).

TPU-first differences: DDP + AMP GradScaler become one jitted train step that
can be pjit-ed over the (data, fsdp, tensor) mesh; the reference's *sharded
EMA dict* (keys round-robined over ranks, :157-159) becomes an EMA pytree
carried with the same ``NamedSharding`` rules as the parameters — GSPMD keeps
each shard resident on its own chip without the hand-written key split.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitron_tpu.models.diffusion import unet_sd_video
from vitron_tpu.models.diffusion.losses import diffusion_loss
from vitron_tpu.models.diffusion.samplers import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class VideoTrainConfig:
    """Defaults follow configs/t2v_train.yaml + train_t2v_enterance.py."""
    lr: float = 3e-5
    weight_decay: float = 0.0
    warmup_steps: int = 10
    total_steps: int = 200_000
    decay_mode: str = "cosine"            # 'linear' | 'cosine' | 'none'
    min_lr: float = 0.0
    use_ema: bool = True
    ema_decay: float = 0.9998
    grad_clip_value: Optional[float] = 0.05   # clip_grad_value_ (FSDP branch)
    p_zero: float = 0.1                   # CFG text dropout probability
    mean_type: str = "v"
    loss_type: str = "mse"
    use_div_loss: bool = False


def annealing_lr(cfg: VideoTrainConfig, step) -> jax.Array:
    """AnnealingLR.get_lr (reference utils/optim/lr_scheduler.py:19-30).

    ``step`` is the scheduler's current_step; like the reference, step 0
    inside warmup yields lr=0 for the very first update.
    """
    step = jnp.asarray(step, jnp.float32)
    warm = cfg.lr * step / max(cfg.warmup_steps, 1)
    ratio = (step - cfg.warmup_steps) / max(cfg.total_steps - cfg.warmup_steps, 1)
    ratio = jnp.clip(ratio, 0.0, 1.0)
    if cfg.decay_mode == "linear":
        decayed = cfg.lr * (1.0 - ratio)
    elif cfg.decay_mode == "cosine":
        decayed = cfg.lr * (jnp.cos(jnp.pi * ratio) + 1.0) / 2.0
    elif cfg.decay_mode == "none":
        decayed = jnp.asarray(cfg.lr, jnp.float32)
    else:
        raise ValueError(cfg.decay_mode)
    lr = jnp.where((cfg.warmup_steps > 0) & (step <= cfg.warmup_steps), warm, decayed)
    return jnp.maximum(lr, cfg.min_lr)


def make_optimizer(cfg: VideoTrainConfig) -> optax.GradientTransformation:
    txs = []
    if cfg.grad_clip_value is not None:
        txs.append(optax.clip(cfg.grad_clip_value))
    txs.append(optax.adamw(lambda step: annealing_lr(cfg, step),
                           weight_decay=cfg.weight_decay))
    return optax.chain(*txs)


def ema_update(ema, params, decay: float):
    """torch ``model.lerp(ema, d)`` == (1-d)·model + d·ema
    (train_t2v_enterance.py:262)."""
    return jax.tree.map(lambda e, p: p + decay * (e - p), ema, params)


def make_video_train_step(unet_cfg: unet_sd_video.UNetSDVideoConfig,
                          sched: DiffusionSchedule,
                          tcfg: VideoTrainConfig,
                          optimizer: Optional[optax.GradientTransformation] = None):
    """Returns ``step(state, batch, rng) -> (state, loss)``.

    state: dict(params, ema, opt_state). batch: dict with
      x0   [B, F, H, W, 4]   VAE latents (already scaled)
      y    [B, L, context_dim] text tokens
      fps  [B] int32
      zero_y_negative [1, L, context_dim]  CFG null embedding
      (i2vgen extra conditioning can ride through ``extras``.)
    The mirror of train_t2v_enterance.py:191-263 minus host-side IO.
    """
    optimizer = optimizer or make_optimizer(tcfg)

    def loss_fn(params, batch, rng):
        d_rng, n_rng, t_rng = jax.random.split(rng, 3)
        x0 = batch["x0"]
        b = x0.shape[0]
        # CFG dropout: rows with rand < p_zero use the null embedding (:222-226)
        drop = jax.random.uniform(d_rng, (b,)) < tcfg.p_zero
        y = jnp.where(drop[:, None, None], batch["zero_y_negative"], batch["y"])
        t = jax.random.randint(t_rng, (b,), 0, sched.num_timesteps)

        def model_fn(xt, t_):
            return unet_sd_video.forward(
                params, unet_cfg, xt.astype(x0.dtype), t_, y=y,
                fps=batch.get("fps"),
                image=batch.get("image"), local_image=batch.get("local_image"))

        per = diffusion_loss(model_fn, x0, t, n_rng, sched,
                             mean_type=tcfg.mean_type, loss_type=tcfg.loss_type,
                             use_div_loss=tcfg.use_div_loss)
        return jnp.mean(per)

    def step(state, batch, rng):
        params, opt_state = state["params"], state["opt_state"]
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = {"params": params, "opt_state": opt_state}
        if tcfg.use_ema:
            new_state["ema"] = ema_update(state["ema"], params, tcfg.ema_decay)
        return new_state, loss

    return step


def init_state(params, tcfg: VideoTrainConfig,
               optimizer: Optional[optax.GradientTransformation] = None) -> Dict[str, Any]:
    """EMA starts as a clone of the weights (train_t2v_enterance.py:157-159)."""
    optimizer = optimizer or make_optimizer(tcfg)
    state = {"params": params, "opt_state": optimizer.init(params)}
    if tcfg.use_ema:
        state["ema"] = jax.tree.map(jnp.asarray, params)
    return state
