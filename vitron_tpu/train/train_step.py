"""GSPMD-sharded multimodal training step.

Replaces the reference's DeepSpeed ZeRO-2 + HF Trainer stack
(reference: vitron/train/train.py:1029-1264, scripts/zero2_offload.json):
parameter/optimizer sharding comes from NamedSharding rules over the
(data, fsdp, tensor) mesh — XLA inserts the all-gathers/reduce-scatters that
ZeRO implements by hand, and no CPU offload is needed.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vitron_tpu.models import vitron_model
from vitron_tpu.train.losses import causal_lm_loss


def make_optimizer(lr: float = 2e-4, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999,
                   grad_clip: Optional[float] = 1.0) -> optax.GradientTransformation:
    """AdamW matching the reference finetune recipe (finetune_lora.sh:27-33)."""
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*txs)


def make_train_step(cfg: vitron_model.VitronConfig, optimizer, trainable_filter=None):
    """Returns a jit-able (params, opt_state, batch, rng) -> (params, opt_state, loss).

    batch: dict with plan arrays + labels + optional media. trainable_filter:
    optional fn(path_tuple) -> bool; frozen leaves get zero updates (the
    reference freezes towers and trains projector/region/LoRA,
    train.py:1185-1212).
    """

    def loss_fn(params, batch):
        logits, _ = vitron_model.forward(
            params, cfg,
            batch["token_ids"], batch["media_idx"], batch["use_media"],
            batch["positions"], batch["attn_mask"],
            images=batch.get("images"), videos=batch.get("videos"),
            block_perm=batch.get("block_perm"),
            region_boxes=batch.get("region_boxes"),
            region_block_idx=batch.get("region_block_idx"),
        )
        return causal_lm_loss(logits, batch["labels"])

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        if trainable_filter is not None:
            grads = _mask_grads(grads, trainable_filter)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def _mask_grads(grads, trainable_filter):
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    treedef = jax.tree_util.tree_structure(grads)
    out = []
    for kp, g in flat:
        path = tuple(getattr(k, "key", getattr(k, "idx", str(k))) for k in kp)
        out.append(g if trainable_filter(path) else jnp.zeros_like(g))
    return jax.tree_util.tree_unflatten(treedef, out)
