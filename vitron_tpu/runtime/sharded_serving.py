"""Multi-chip serving assembly: mesh resolution + param/cache placement.

The flagship deployment (SURVEY §7 step 9, BASELINE.md v5e-8 North Star)
shards the Vicuna-7B LLM over the slice (fsdp x tensor,
llama.LLAMA_SHARDING_RULES) while the diffusion/SEEM backends stay
replicated; the KV caches put their KV-head axis on `tensor` so decode
attention is local to each chip and GSPMD inserts only the per-layer
all-reduces the megatron split requires.

`build_system_from_weights(..., mesh="auto")` routes through here; the
reference has no equivalent (single GPU, per-request checkpoint reloads —
reference app.py:94-103).
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np


def serving_mesh(n_devices: Optional[int] = None, devices=None):
    """fsdp x tensor serving mesh over n devices (tensor=2 when even: KV
    heads split two ways keeps attention local while fsdp bounds per-chip
    weight residency)."""
    import jax

    from vitron_tpu.core.mesh import create_mesh

    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    tensor = 2 if n % 2 == 0 else 1
    return create_mesh({"fsdp": n // tensor, "tensor": tensor},
                       devices=devices[:n])


def resolve_serving_mesh(mesh: Any):
    """None | "auto" | Mesh -> Mesh or None (single-chip)."""
    import jax
    from jax.sharding import Mesh

    if mesh is None:
        return None
    if isinstance(mesh, Mesh):
        return mesh
    if mesh == "auto":
        n = len(jax.devices())
        return serving_mesh(n) if n > 1 else None
    raise ValueError(f"mesh must be None, 'auto', or a Mesh; got {mesh!r}")


def shard_llm_params(params, mesh):
    """Place the full Vitron param tree on the mesh: LLM weights sharded by
    llama.LLAMA_SHARDING_RULES (fsdp x tensor), towers/projector/region by
    the ViT rules (they fall back to replicated where dims don't divide)."""
    from vitron_tpu.core.mesh import shard_params
    from vitron_tpu.models import vitron_model

    return shard_params(params, mesh, vitron_model.VITRON_SHARDING_RULES)


def kv_cache_shardings(mesh, cfg_llm):
    """NamedSharding pytree for llama.KVCache: KV-head axis (=3 of
    [L, B, max_len, KV, D]) on `tensor`, replicated otherwise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitron_tpu.models.llm import llama

    tensor = mesh.shape.get("tensor", 1)
    kv_spec = (P(None, None, None, "tensor", None)
               if tensor > 1 and cfg_llm.num_kv_heads % tensor == 0 else P())
    return llama.KVCache(
        k=NamedSharding(mesh, kv_spec),
        v=NamedSharding(mesh, kv_spec),
        index=NamedSharding(mesh, P()),
        valid=NamedSharding(mesh, P()),
    )


def paged_pool_shardings(mesh, cfg_llm):
    """NamedShardings for the PagedPool k/v ([L, nb, bs, KV, D]): KV heads
    on `tensor` (same placement the multichip dryrun validates)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    tensor = mesh.shape.get("tensor", 1)
    spec = (P(None, None, None, "tensor", None)
            if tensor > 1 and cfg_llm.num_kv_heads % tensor == 0 else P())
    return NamedSharding(mesh, spec)


def install_mesh(system, mesh) -> None:
    """Wire an already-built system for mesh execution: shard resident LLM
    params, set the generator's cache sharding (fresh KV caches land on the
    mesh instead of the default device), and remember the mesh so serving
    components (ContinuousBatcher) place their pools on it."""
    gen = system.engine.generator
    gen.params = shard_llm_params(gen.params, mesh)
    gen.cache_sharding = kv_cache_shardings(mesh, gen.cfg.llm)
    system.serving_mesh = mesh
