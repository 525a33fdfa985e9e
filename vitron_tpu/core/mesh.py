"""Device mesh and sharding helpers.

The reference scales with data parallelism only (DeepSpeed ZeRO-2 / DDP /
NCCL, reference: scripts/finetune_lora.sh:10, SURVEY §2.4). Here parallelism
is first-class GSPMD: one `jax.sharding.Mesh` with named axes

    data    — batch (replaces DDP/ZeRO data parallel)
    fsdp    — parameter/optimizer sharding (replaces ZeRO-2/3)
    tensor  — megatron-style tensor parallel within attention/MLP
    context — sequence/ring parallel for long-video attention (new surface)

Parameter placement is expressed as `PartitionSpec` trees produced from
per-model sharding-rule tables; XLA inserts all collectives.
"""
from __future__ import annotations

import functools
from typing import Mapping, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
CONTEXT_AXIS = "context"

MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, CONTEXT_AXIS)


def create_mesh(
    shape: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh.

    Args:
      shape: axis name -> size. Missing axes get size 1; one axis may be -1
        to absorb all remaining devices. Default: everything on `fsdp`
        (pure ZeRO-3-style sharding, the best single-slice default for a 7B
        model on v5e-8).
      devices: override device list (tests pass CPU devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = dict(shape or {FSDP_AXIS: -1})
    sizes = []
    wildcard = None
    for ax in MESH_AXES:
        s = shape.get(ax, 1)
        if s == -1:
            wildcard = ax
            sizes.append(1)
        else:
            sizes.append(s)
    fixed = int(np.prod(sizes))
    if wildcard is not None:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[MESH_AXES.index(wildcard)] = n // fixed
    elif fixed != n:
        raise ValueError(f"mesh shape {shape} needs {fixed} devices, have {n}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, MESH_AXES)


def local_mesh(n: int = 1) -> Mesh:
    """A tiny mesh over the first n local devices (single-chip default)."""
    return create_mesh({FSDP_AXIS: n}, devices=jax.devices()[:n])


def spec_for(path: Tuple[str, ...], rules: Sequence[Tuple[str, P]]) -> P:
    """First-match sharding rule lookup: rule key is a substring of the
    '/'-joined param path."""
    joined = "/".join(str(p) for p in path)
    for key, spec in rules:
        if key in joined:
            return spec
    return P()


def fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop spec entries that cannot apply to `shape`: axes whose mesh size
    does not divide the dim, and entries beyond the array's rank. Lets one
    substring rule cover a weight AND its satellites (quantization scales
    [L, 1, out], LoRA factors) — the undividable dims just replicate."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for dim, names in zip(shape, parts[: len(shape)]):
        if names is None:
            out.append(None)
            continue
        group = names if isinstance(names, tuple) else (names,)
        k = int(np.prod([mesh.shape[a] for a in group]))
        out.append(names if k and dim % k == 0 else None)
    return P(*out)


def make_param_shardings(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """PartitionSpec tree -> NamedSharding tree matching a param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [tuple(_key_str(k) for k in kp) for kp, _ in flat]
    specs = [fit_spec(spec_for(p, rules), np.shape(leaf), mesh)
             for p, (_, leaf) in zip(paths, flat)]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in specs]
    )


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Device-put a param pytree according to sharding rules."""
    shardings = make_param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)


@functools.lru_cache(maxsize=None)
def axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]
