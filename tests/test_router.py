"""Router: dispatch table, error paths, region parsing."""
import numpy as np
import pytest

from vitron_tpu.runtime.router import (
    BackendRegistry,
    TaskRequest,
    parse_region_boxes,
    route_model_output,
)


def test_dispatch_known_module():
    reg = BackendRegistry()
    calls = []
    reg.register("B", lambda req: calls.append(req) or {"mask": "yes"})
    out = route_model_output(
        reg, "Sure! <module>B</module> <instruction>task: segment the dog</instruction>",
        image=np.zeros((4, 4, 3), np.uint8))
    assert out["status"] == "ok"
    assert out["task"] == "image_segmentation"
    assert out["mask"] == "yes"
    assert calls[0].instructions == ["segment the dog"]


def test_chat_when_no_module():
    reg = BackendRegistry()
    out = route_model_output(reg, "just a friendly answer")
    assert out["status"] == "chat"
    assert out["text"] == "just a friendly answer"


def test_unregistered_backend():
    reg = BackendRegistry()
    out = route_model_output(reg, "<module>D</module>")
    assert out["status"] == "unavailable"
    assert "video_generation" in out["error"]


def test_unknown_module_letter():
    reg = BackendRegistry()
    out = route_model_output(reg, "<module>Z</module>")
    assert out["status"] == "error"


def test_register_invalid_letter():
    reg = BackendRegistry()
    with pytest.raises(ValueError):
        reg.register("Q", lambda r: {})


def test_parse_region_boxes():
    assert parse_region_boxes("[10, 20, 100, 200]") == [[10.0, 20.0, 100.0, 200.0]]
    assert parse_region_boxes("[1,2,3,4] and [5,6,7,8]") == [[1, 2, 3, 4], [5, 6, 7, 8]]
    assert parse_region_boxes(None) == []
    assert parse_region_boxes("[not, numbers, here, x]") == []
    assert parse_region_boxes("[1,2,3]") == []  # wrong arity dropped


def test_timings_recorded():
    reg = BackendRegistry()
    reg.register("A", lambda req: {"image": None})
    route_model_output(reg, "<module>A</module>")
    assert reg.timings and reg.timings[0]["task"] == "image_generation"
