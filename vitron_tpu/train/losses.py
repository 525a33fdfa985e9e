"""Training losses.

Causal-LM cross entropy with IGNORE_INDEX label masking — the reference
masks all non-assistant tokens to -100 during conversation preprocessing
(reference: vitron/train/train.py:480-560) and relies on HF's shifted CE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vitron_tpu.constants import IGNORE_INDEX


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted cross entropy. logits: [B, L, V] fp32; labels: [B, L] int32
    with IGNORE_INDEX at masked positions. Returns scalar mean over valid
    target tokens."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_logp, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count
