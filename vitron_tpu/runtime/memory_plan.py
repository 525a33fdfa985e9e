"""Resident multi-model HBM budget planning.

The reference dodges memory planning by re-loading every backend's
checkpoint from disk per request (reference: app.py:94-103, 228, 295-303,
324) and paying seconds of load latency each time. Here all backends stay
resident, so placement against the per-chip HBM budget is an explicit,
checkable plan (SURVEY §7 "multi-model memory budget").

Typical single-chip v5e (16 GB) plan with the int4 LLM:

    llm (7B int4 + bf16 embeds)   ~3.9 GB
    vision towers (ViT-L x2)      ~1.2 GB
    seem (FocalNet-L)             ~0.9 GB
    sd (UNet+VAE+text, bf16)      ~2.5 GB
    video unet                    ~2.8 GB
    KV cache + activations        rest

`MemoryPlan` sums actual leaf bytes (quantized dicts included) and fails
fast at registration time instead of OOMing mid-request.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import numpy as np


def tree_bytes(tree: Any) -> int:
    """Total bytes of every array leaf (works on device and host arrays)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += int(leaf.size) * np.dtype(leaf.dtype).itemsize
    return total


def kv_cache_bytes(num_layers: int, batch: int, max_len: int, kv_heads: int,
                   head_dim: int, bytes_per_el: int = 2) -> int:
    """Preallocated dense KV cache footprint (k + v)."""
    return 2 * num_layers * batch * max_len * kv_heads * head_dim * bytes_per_el


@dataclasses.dataclass
class MemoryPlan:
    """Tracks resident model placement against a per-chip HBM budget.

    Multi-chip deployments (SURVEY §7: Vicuna-7B sharded over 8 x 16 GB
    chips, backends replicated) set ``chips`` > 1 and mark sharded entries:
    a sharded entry costs total/chips per chip; a replicated entry costs its
    full size on every chip. ``fits``/``report`` are per-chip."""

    budget_bytes: int = 16 * 1024 ** 3          # v5e HBM
    reserve_bytes: int = 2 * 1024 ** 3          # activations / cache headroom
    chips: int = 1
    entries: Dict[str, int] = dataclasses.field(default_factory=dict)
    sharded: Dict[str, bool] = dataclasses.field(default_factory=dict)
    shard_factor: Dict[str, int] = dataclasses.field(default_factory=dict)

    def add(self, name: str, params_or_bytes: Any,
            strict: bool = False, sharded: bool = False,
            shard_factor: int = 0) -> int:
        """Register a resident model; returns its measured TOTAL bytes.

        sharded=True marks the entry as mesh-sharded over ALL chips
        (per-chip cost = total/chips). An entry sharded over only a mesh
        sub-axis (e.g. a KV pool split on `tensor` but replicated across
        `fsdp`) must pass its actual division as shard_factor — per-chip
        cost = total/shard_factor. strict=True raises when the plan no
        longer fits instead of just recording it (callers that can shed
        precision — e.g. requantize — catch this)."""
        n = (int(params_or_bytes) if isinstance(params_or_bytes, (int, np.integer))
             else tree_bytes(params_or_bytes))
        self.entries[name] = n
        self.sharded[name] = bool(sharded) or shard_factor > 1
        self.shard_factor[name] = (
            int(shard_factor) if shard_factor > 1
            else (self.chips if sharded else 1))
        if strict and not self.fits:
            raise MemoryError(
                f"memory plan over budget adding {name!r}:\n{self.report()}")
        return n

    def per_chip_bytes(self, name: str) -> int:
        n = self.entries[name]
        f = self.shard_factor.get(name, self.chips if self.sharded.get(name) else 1)
        return -(-n // max(f, 1))

    @property
    def resident_bytes(self) -> int:
        """Per-chip resident bytes (== total when chips == 1)."""
        return sum(self.per_chip_bytes(k) for k in self.entries)

    @property
    def total_bytes(self) -> int:
        return sum(self.entries.values())

    @property
    def fits(self) -> bool:
        return self.resident_bytes + self.reserve_bytes <= self.budget_bytes

    def report(self) -> str:
        gib = 1024 ** 3
        lines = []
        if self.chips > 1:
            lines.append(f"placement over {self.chips} chips "
                         f"(per-chip budget {self.budget_bytes / gib:.0f} GiB):")
        for name, n in sorted(self.entries.items(), key=lambda kv: -kv[1]):
            pc = self.per_chip_bytes(name)
            tag = (f"  sharded/{self.chips}" if self.sharded.get(name)
                   else ("  replicated" if self.chips > 1 else ""))
            lines.append(f"{name:<24} {pc / gib:7.2f} GiB/chip"
                         f" (total {n / gib:6.2f}){tag}")
        lines.append(f"{'resident total':<24} {self.resident_bytes / gib:7.2f} GiB/chip")
        lines.append(f"{'reserve (act/cache)':<24} {self.reserve_bytes / gib:7.2f} GiB")
        lines.append(f"{'budget':<24} {self.budget_bytes / gib:7.2f} GiB"
                     f"  ({'OK' if self.fits else 'OVER'})")
        return "\n".join(lines)
