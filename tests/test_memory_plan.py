"""Multi-chip MemoryPlan accounting (SURVEY §7 deployment math)."""
import numpy as np

from vitron_tpu.runtime.memory_plan import MemoryPlan, kv_cache_bytes, tree_bytes


def test_single_chip_backward_compat():
    p = MemoryPlan()
    p.add("a", 4 * 1024 ** 3)
    assert p.resident_bytes == 4 * 1024 ** 3
    assert p.fits


def test_sharded_vs_replicated_per_chip():
    gib = 1024 ** 3
    p = MemoryPlan(chips=8)
    p.add("llm", 14 * gib, sharded=True)      # 7B bf16 over 8 chips
    p.add("backend", 3 * gib)                 # replicated
    assert p.per_chip_bytes("llm") == -(-14 * gib // 8)
    assert p.per_chip_bytes("backend") == 3 * gib
    assert p.resident_bytes == p.per_chip_bytes("llm") + 3 * gib
    assert p.total_bytes == 17 * gib
    assert p.fits
    rep = p.report()
    assert "sharded/8" in rep and "replicated" in rep and "8 chips" in rep


def test_over_budget_detection():
    gib = 1024 ** 3
    p = MemoryPlan(chips=2)
    p.add("llm", 14 * gib, sharded=True)   # 7 GiB/chip
    p.add("video", 9 * gib)                # replicated 9 GiB -> 16 + 2 reserve
    assert not p.fits
    try:
        p.add("more", gib, strict=True)
        assert False, "expected MemoryError"
    except MemoryError:
        pass


def test_tree_bytes_counts_quantized_leaves():
    tree = {"w": np.zeros((4, 4), np.int8), "s": np.zeros((4,), np.float32)}
    assert tree_bytes(tree) == 16 + 16
    assert kv_cache_bytes(2, 1, 8, 4, 16) == 2 * 2 * 1 * 8 * 4 * 16 * 2
