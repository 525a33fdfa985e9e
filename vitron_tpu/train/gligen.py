"""GLIGEN grounded fine-tuning: train the gated self-attention fusers +
PositionNet (and optional grounding downsamplers) with the SD backbone,
VAE, and text encoder frozen.

Mirrors the reference GLIGEN trainer (reference:
modules/GLIGEN/trainer.py:218-245 trainable-param selection,
:353-372 run_one_step eps-MSE, modules/GLIGEN/ldm/modules/
diffusionmodules/openaimodel.py:426-429 the 10% grounding-null drop,
main.py:26-27 AdamW lr=5e-5 wd=0). EMA is off by default — upstream's
own comment: "It is worse than normal model in early experiments, thus
never enabled later" (trainer.py:250).

TPU-native shape: one jitted functional step; the frozen/trainable split
is an `optax.multi_transform` over the param tree (frozen leaves get
`set_to_zero`, so no optimizer state is allocated for the ~95% of params
that stay fixed — gradients still flow THROUGH them to reach the fusers,
exactly like the reference's requires_grad split).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from vitron_tpu.models.diffusion import unet2d
from vitron_tpu.models.diffusion.losses import diffusion_loss
from vitron_tpu.models.diffusion.samplers import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class GligenTrainConfig:
    """Defaults follow modules/GLIGEN/main.py:26-35."""
    lr: float = 5e-5
    weight_decay: float = 0.0
    p_drop_grounding: float = 0.1     # openaimodel.py:428 whole-null drop
    l_simple_weight: float = 1.0
    input_conv_train: bool = False    # inpainting variant trains conv_in
    grad_clip_norm: Optional[float] = None


def _is_trainable(path, input_conv_train: bool) -> bool:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(p.key)
        elif hasattr(p, "idx"):
            keys.append(p.idx)
        else:
            keys.append(str(p))
    if "fuser" in keys or "position_net" in keys or "downsample_net" in keys:
        return True
    if input_conv_train and keys[:3] == ["input_blocks", 0, 0]:
        # the inpainting UNet's widened first conv lives at
        # params["input_blocks"][0][0]{w,b} (trainer.py:232-236)
        return True
    return False


def trainable_mask(params, cfg: GligenTrainConfig):
    """Bool pytree: True on leaves the reference trainer optimizes."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_trainable(path, cfg.input_conv_train), params)


def partition_params(params, cfg: GligenTrainConfig):
    """Split counts for reporting (reference count_params, trainer.py:114)."""
    mask = trainable_mask(params, cfg)
    leaves = jax.tree.leaves(jax.tree.map(
        lambda m, p: int(p.size) if m else 0, mask, params))
    frozen = jax.tree.leaves(jax.tree.map(
        lambda m, p: 0 if m else int(p.size), mask, params))
    return sum(leaves), sum(frozen)


def make_optimizer(params, cfg: GligenTrainConfig):
    labels = jax.tree.map(lambda m: "train" if m else "freeze",
                          trainable_mask(params, cfg))
    txs = []
    if cfg.grad_clip_norm is not None:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    txs.append(optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
    return optax.multi_transform(
        {"train": optax.chain(*txs), "freeze": optax.set_to_zero()}, labels)


def make_gligen_train_step(unet_cfg: unet2d.UNetConfig,
                           sched: DiffusionSchedule,
                           tcfg: GligenTrainConfig,
                           optimizer: Optional[optax.GradientTransformation] = None):
    """Returns ``step(state, batch, rng) -> (state, loss)``.

    state: dict(params, opt_state). batch:
      x0      [B, H, W, 4]     VAE latents (already scaled)
      context [B, L, 768]      CLIP text embeddings
      boxes   [B, max_box, 4]  normalized xyxy
      masks   [B, max_box]     box validity (float)
      phrase_emb [B, max_box, 768] CLIP phrase embeddings

    The grounding tokens are recomputed inside the loss (PositionNet is
    trainable); the 10% null drop zeroes boxes/masks/embeddings exactly
    like get_null_input (text_grounding_tokinzer_input.py:29-44).
    """

    def loss_fn(params, batch, rng):
        d_rng, l_rng, t_rng = jax.random.split(rng, 3)
        x0 = batch["x0"]
        b = x0.shape[0]
        drop = jax.random.uniform(d_rng, ()) < tcfg.p_drop_grounding
        zero = jnp.where(drop, 0.0, 1.0)
        objs = unet2d.grounding_tokens(
            params, batch["boxes"] * zero, batch["masks"] * zero,
            batch["phrase_emb"] * zero)
        # t ~ floor(U[0,1)*1000), 1000 -> 999 (trainer.py:335-337)
        t = jax.random.randint(t_rng, (b,), 0, sched.num_timesteps)

        def model_fn(xt, t_):
            return unet2d.forward(params, unet_cfg, xt.astype(x0.dtype), t_,
                                  batch["context"], objs=objs)

        per = diffusion_loss(model_fn, x0, t, l_rng, sched,
                             mean_type="eps", loss_type="mse")
        return jnp.mean(per) * tcfg.l_simple_weight

    opt = optimizer

    def step(state, batch, rng):
        params, opt_state = state["params"], state["opt_state"]
        nonlocal opt
        if opt is None:
            opt = make_optimizer(params, tcfg)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, "opt_state": opt_state}, loss

    def init_state(params):
        nonlocal opt
        if opt is None:
            opt = make_optimizer(params, tcfg)
        return {"params": params, "opt_state": opt.init(params)}

    return step, init_state
