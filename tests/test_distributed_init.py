"""Multihost init plumbing (single-process unit tests).

The reference's equivalents are its NCCL init wrappers
(i2vgen utils/distributed.py, SEEM demo_code/utils/distributed.py:8-35);
here jax.distributed.initialize is the one entry point. Real multihost
needs multiple processes; these tests pin the env-protocol parsing and the
single-host no-op path.
"""
import os

import pytest

from vitron_tpu.core import distributed as dist


def test_from_env_jax_names(monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    cfg = dist.DistributedConfig.from_env()
    assert cfg.coordinator_address == "10.0.0.1:1234"
    assert cfg.num_processes == 4
    assert cfg.process_id == 2


def test_from_env_torch_names(monkeypatch):
    """The reference env protocol (RANK/WORLD_SIZE/MASTER_ADDR) maps over."""
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.9")
    monkeypatch.setenv("MASTER_PORT", "29500")
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("RANK", "3")
    cfg = dist.DistributedConfig.from_env()
    assert cfg.coordinator_address == "10.0.0.9:29500"
    assert cfg.num_processes == 8
    assert cfg.process_id == 3


def test_from_env_mpi_rank(monkeypatch):
    """SEEM's OMPI detection (utils/distributed.py:8-35)."""
    for k in ("COORDINATOR_ADDRESS", "PROCESS_ID", "RANK", "MASTER_ADDR",
              "NUM_PROCESSES", "WORLD_SIZE"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "1")
    cfg = dist.DistributedConfig.from_env()
    assert cfg.process_id == 1
    assert cfg.coordinator_address is None


def test_single_host_is_noop(monkeypatch):
    """No coordinator + no pod metadata -> initialize() returns False and
    jax keeps working single-process."""
    for k in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS", "RANK", "WORLD_SIZE",
              "NUM_PROCESSES", "PROCESS_ID", "OMPI_COMM_WORLD_RANK"):
        monkeypatch.delenv(k, raising=False)
    assert dist.initialize() is False
    info = dist.process_info()
    assert info["process_count"] == 1
    assert info["initialized"] is False
    assert dist.is_primary()
