"""Utils: weight tools parity with reference semantics, config round-trip,
logger, stage timer."""
import json
import numpy as np

from vitron_tpu.core.config import SystemConfig, from_dict, to_dict
from vitron_tpu.models.weight_tools import apply_delta, consolidate, make_delta


def test_delta_roundtrip():
    rs = np.random.RandomState(0)
    base = {"a": rs.randn(4, 3).astype(np.float32),
            "b": rs.randn(2, 3).astype(np.float32)}
    target = {"a": rs.randn(4, 3).astype(np.float32),
              "b": rs.randn(5, 3).astype(np.float32)}  # vocab growth
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for k in target:
        np.testing.assert_allclose(back[k], target[k], rtol=1e-6)


def test_consolidate():
    a = {"x": np.ones(2)}
    b = {"y": np.zeros(3)}
    out = consolidate([a, b])
    assert set(out) == {"x", "y"}


def test_system_config_roundtrip(tmp_path):
    cfg = SystemConfig(base_model="/ckpt/vicuna", quantize_llm="int8",
                       mesh_shape={"fsdp": 8})
    p = tmp_path / "sys.json"
    cfg.save(str(p))
    loaded = SystemConfig.load(str(p))
    assert loaded.base_model == "/ckpt/vicuna"
    assert loaded.quantize_llm == "int8"
    assert loaded.mesh_shape == {"fsdp": 8}
    assert loaded.enable == ("A", "B", "C", "D", "E", "F", "G")


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"base_model": "x", "typo_key": 1}))
    import pytest

    with pytest.raises(ValueError, match="typo_key"):
        SystemConfig.load(str(p))


def test_logger_and_timer(tmp_path, monkeypatch):
    import vitron_tpu.utils.logging as vlog

    monkeypatch.setattr(vlog, "LOGDIR", str(tmp_path))
    monkeypatch.setattr(vlog, "_handler", None)
    logger = vlog.build_logger("test", "test.log")
    logger.info("hello rotating file")
    import glob

    assert glob.glob(str(tmp_path / "test.log*"))

    from vitron_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("encode"):
        pass
    with t.stage("decode"):
        pass
    s = t.summary()
    assert "encode" in s and "total" in s


def test_count_flops_matmul():
    """XLA cost analysis replaces the reference's thop FLOP counting
    (i2vgen test_func/test_models.py): a [64,128]@[128,32] matmul is
    2*64*128*32 = 524288 FLOPs."""
    import jax.numpy as jnp

    from vitron_tpu.utils.profiling import count_flops

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    costs = count_flops(lambda x, y: x @ y, a, b)
    assert costs["flops"] == 2 * 64 * 128 * 32
    assert costs["bytes_accessed"] > 0
    assert costs["arithmetic_intensity"] > 0


def test_memory_plan_tracks_and_reports():
    import jax.numpy as jnp

    from vitron_tpu.runtime.memory_plan import MemoryPlan, kv_cache_bytes, tree_bytes

    tree = {"w": jnp.zeros((1024, 1024), jnp.bfloat16),
            "q": {"q4": jnp.zeros((512, 1024), jnp.int8),
                  "s": jnp.zeros((1, 1024), jnp.float32)},
            "cfg": "not-an-array"}
    n = tree_bytes(tree)
    assert n == 1024 * 1024 * 2 + 512 * 1024 + 1024 * 4

    plan = MemoryPlan(budget_bytes=10 * 1024 ** 2, reserve_bytes=1024 ** 2)
    plan.add("model", tree)
    assert plan.fits
    rep = plan.report()
    assert "model" in rep and "OK" in rep
    plan.add("big", 20 * 1024 ** 2)
    assert not plan.fits and "OVER" in plan.report()
    import pytest

    with pytest.raises(MemoryError):
        plan.add("more", 1, strict=True)
    assert kv_cache_bytes(32, 1, 1024, 32, 128) == 2 * 32 * 1024 * 32 * 128 * 2


def test_moderation_fail_open_and_flagging(monkeypatch):
    """Reference semantics (vitron/utils.py:117-135): flagged comes from the
    service response; ANY failure (or no API key) reads as not-flagged."""
    from vitron_tpu.mm.moderation import violates_moderation

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert violates_moderation("anything") is False  # no key -> disabled

    calls = {}

    def fake_post(url, data, headers, timeout):
        import json
        calls["payload"] = json.loads(data)
        return {"results": [{"flagged": True}]}

    assert violates_moderation("bad\ntext", post=fake_post) is True
    # newline stripped before sending, like the reference
    assert calls["payload"] == {"input": "badtext"}

    def boom(url, data, headers, timeout):
        raise OSError("network down")

    assert violates_moderation("text", post=boom) is False
    assert violates_moderation(
        "text", post=lambda *a: {"unexpected": 1}) is False


def test_video_backend_selection(tmp_path):
    """Explicit unknown backend raises the reference's NameError
    (processing_video.py:67-69); explicit unavailable backend does not
    silently fall through to another decoder."""
    import pytest

    from vitron_tpu.media.preprocess import load_video_frames

    with pytest.raises(NameError):
        load_video_frames("x.mp4", backend="nvdec")
    try:
        import pytorchvideo  # noqa: F401
        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises((ImportError, FileNotFoundError)):
            load_video_frames(str(tmp_path / "missing.mp4"),
                              backend="pytorchvideo")
