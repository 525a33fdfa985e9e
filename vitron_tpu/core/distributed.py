"""Multihost/distributed initialization over ICI/DCN.

TPU-native replacement for the reference's three NCCL init wrappers
(reference: modules/i2vgen-xl/utils/distributed.py:1-60 env-driven
init_process_group; modules/SEEM/demo_code/utils/distributed.py:8-35
MPI-env detection; DeepSpeed launcher scripts/finetune_lora.sh:10).

On TPU there are no explicit process groups: `jax.distributed.initialize`
wires every host into one runtime, `jax.devices()` becomes the global
device list, and all communication is emitted by GSPMD from NamedSharding
annotations (collectives ride ICI within a slice, DCN across slices).
This module is the single entry point the apps/trainer call once at boot;
it is env-driven (works under TPU pod metadata autodetection, GKE, or
explicit COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID like the
reference's RANK/WORLD_SIZE env protocol).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    """Explicit override of the env protocol (None -> autodetect)."""

    coordinator_address: Optional[str] = None   # "host:port"
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    local_device_ids: Optional[tuple] = None

    @staticmethod
    def from_env() -> "DistributedConfig":
        """Read the reference-style env protocol: the reference keys on
        RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT
        (i2vgen utils/distributed.py, OMPI_* in SEEM); jax's own names
        (COORDINATOR_ADDRESS etc.) take precedence when present."""
        addr = os.environ.get("COORDINATOR_ADDRESS")
        if addr is None and os.environ.get("MASTER_ADDR"):
            addr = (os.environ["MASTER_ADDR"] + ":"
                    + os.environ.get("MASTER_PORT", "8476"))
        nproc = os.environ.get("NUM_PROCESSES") or os.environ.get("WORLD_SIZE")
        pid = os.environ.get("PROCESS_ID")
        if pid is None:
            pid = (os.environ.get("RANK")
                   or os.environ.get("OMPI_COMM_WORLD_RANK"))
        return DistributedConfig(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid is not None else None,
        )


_initialized = False


def initialize(cfg: Optional[DistributedConfig] = None) -> bool:
    """Initialize the multihost runtime once; safe to call on single-host.

    Returns True if `jax.distributed.initialize` ran, False when this is a
    plain single-process session (no coordinator configured and no pod
    metadata) — in which case jax works as-is and nothing needs tearing
    down. Idempotent (the reference's init wrappers guard the same way,
    SEEM utils/distributed.py:12-16).
    """
    global _initialized
    if _initialized:
        return True
    import jax

    cfg = cfg or DistributedConfig.from_env()
    in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  and "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")) or \
        bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    explicit = cfg.coordinator_address is not None
    if not explicit and not in_pod:
        return False  # single host, single process: nothing to initialize
    kwargs = {}
    if cfg.coordinator_address is not None:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes is not None:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id is not None:
        kwargs["process_id"] = cfg.process_id
    if cfg.local_device_ids is not None:
        kwargs["local_device_ids"] = list(cfg.local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def shutdown() -> None:
    global _initialized
    if _initialized:
        import jax

        jax.distributed.shutdown()
        _initialized = False


def process_info() -> dict:
    """Rank/world-size view (replaces the reference's get_rank/get_world_size
    helpers, i2vgen utils/distributed.py)."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "initialized": _initialized,
    }


def is_primary() -> bool:
    """rank-0 gate (reference rank0_print, train.py:48-50)."""
    import jax

    return jax.process_index() == 0
