"""Dtype policy.

TPU-first: parameters and activations default to bfloat16 (native MXU
format), accumulation/softmax/norms in float32. The reference runs fp16 on
GPU (vitron/model/builder.py:47); bf16 needs no loss scaling and is the
native TPU choice.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast_params(self, params):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )


DEFAULT = DtypePolicy()
FP32 = DtypePolicy(jnp.float32, jnp.float32, jnp.float32)
