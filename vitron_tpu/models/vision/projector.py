"""Vision->LM projector.

Reference: vitron/model/multimodal_projector/builder.py:33-51. The trained
config uses `mlp2x_gelu` (Linear 1024->4096, GELU, Linear 4096->4096,
scripts/finetune_lora.sh:20); `linear` and `identity` also supported.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def init_params(rng: jax.Array, in_dim: int, out_dim: int,
                projector_type: str = "mlp2x_gelu",
                dtype: Any = jnp.float32) -> Dict[str, Any]:
    k1, k2 = jax.random.split(rng)

    def dense(key, shape):
        s = 1.0 / jnp.sqrt(shape[0])
        return (jax.random.normal(key, shape, jnp.float32) * s).astype(dtype)

    if projector_type == "identity":
        return {}
    if projector_type == "linear":
        return {"w": dense(k1, (in_dim, out_dim)), "b": jnp.zeros((out_dim,), dtype)}
    if projector_type == "mlp2x_gelu":
        return {
            "w1": dense(k1, (in_dim, out_dim)), "b1": jnp.zeros((out_dim,), dtype),
            "w2": dense(k2, (out_dim, out_dim)), "b2": jnp.zeros((out_dim,), dtype),
        }
    raise ValueError(f"unknown projector type {projector_type}")


def apply(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Projector type is implied by the param keys (w1/w2 = mlp2x_gelu,
    w = linear, empty = identity) so the tree stays pure arrays."""
    if not params:
        return x
    if "w" in params:
        return x @ params["w"] + params["b"]
    # exact (erf) GELU: torch nn.GELU default
    h = x @ params["w1"] + params["b1"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["w2"] + params["b2"]


def convert_hf(state_dict, prefix: str = "model.mm_projector.") -> Dict[str, Any]:
    """HF keys: {prefix}0.weight/0.bias/2.weight/2.bias (Sequential)."""
    import numpy as np

    def g(k):
        v = state_dict[prefix + k]
        if not isinstance(v, np.ndarray):
            v = v.detach().float().cpu().numpy()
        return v

    if prefix + "2.weight" in set(state_dict.keys()):
        return {
            "w1": np.ascontiguousarray(g("0.weight").T), "b1": g("0.bias"),
            "w2": np.ascontiguousarray(g("2.weight").T), "b2": g("2.bias"),
        }
    return {"w": np.ascontiguousarray(g("weight").T), "b": g("bias")}
