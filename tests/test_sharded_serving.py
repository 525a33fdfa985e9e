"""Multi-chip serving assembly on the 8-device virtual CPU mesh.

The v5e-8 flagship deployment (SURVEY §7 step 9, BASELINE.md North Star):
`build_system_from_weights(..., mesh=...)` shards the resident LLM
fsdp x tensor, KV caches ride the mesh (KV heads on `tensor`), and one
full /chat request routes through the sharded system — protocol turn
through the sharded prefill/decode, then a backend sampler step.
"""
import numpy as np
import pytest

import jax

from vitron_tpu.runtime.assembly import build_system_from_weights
from vitron_tpu.runtime.generation import SamplingConfig
from vitron_tpu.runtime.router import route_model_output
from vitron_tpu.runtime.sharded_serving import (
    kv_cache_shardings,
    resolve_serving_mesh,
    serving_mesh,
)


@pytest.fixture(scope="module")
def sharded_system(synth_weights):
    mesh = serving_mesh(8)
    system, report = build_system_from_weights(
        str(synth_weights), geometry="tiny", mesh=mesh)
    return system, report, mesh


def test_mesh_reported_and_params_sharded(sharded_system):
    system, report, mesh = sharded_system
    assert report.rows["mesh"]["status"] == "loaded"
    # at least one LLM weight actually spans multiple devices
    leaves = jax.tree.leaves(system.engine.generator.params["llm"])
    spans = [len(l.sharding.device_set) for l in leaves if hasattr(l, "sharding")]
    assert max(spans) == 8, f"no leaf sharded over the mesh: {set(spans)}"


def test_routed_chat_request_through_sharded_system(sharded_system):
    """One full /chat: multimodal prefill + decode on the sharded params
    (fresh KV cache lands on the mesh), then the protocol turn routes a
    task-D sampler step (backends replicated per the MemoryPlan)."""
    system, _, mesh = sharded_system
    img = np.random.RandomState(0).randint(0, 255, (40, 40, 3), np.uint8)
    out = system.chat("describe this image", image=img,
                      sampling=SamplingConfig(temperature=0.7, top_p=0.9,
                                              max_new_tokens=4, eos_ids=()),
                      rng=jax.random.PRNGKey(0))
    assert isinstance(out["reply"]["raw"], str)
    routed = route_model_output(
        system.registry,
        "<module>D</module> <instruction>prompt: a dog running</instruction>")
    assert routed["status"] == "ok"
    assert routed["video"].shape == (4, 16, 16, 3)


def test_continuous_batcher_on_mesh(sharded_system):
    """Co-batched decode through the paged pool with KV heads on `tensor`:
    two concurrent requests share decode chunks on the sharded weights."""
    from vitron_tpu.runtime.pipeline import ServingPipeline

    system, _, mesh = sharded_system
    pipeline = ServingPipeline(system, batched=True, max_active=4,
                               decode_chunk=4, num_kv_blocks=64)
    try:
        pool = pipeline.batcher.server.pool
        assert len(pool.k.sharding.device_set) == 8
        sampling = SamplingConfig(greedy=True, max_new_tokens=6, eos_ids=())
        futs = [pipeline.submit(f"hello number {i}", sampling=sampling)
                for i in range(2)]
        outs = [f.result(timeout=600) for f in futs]
        for out in outs:
            assert isinstance(out["reply"]["raw"], str)
        assert pipeline.batcher.stats()["finished"] == 2
    finally:
        pipeline.close()


def test_resolve_serving_mesh_forms():
    mesh = serving_mesh(8)
    assert resolve_serving_mesh(mesh) is mesh
    assert resolve_serving_mesh(None) is None
    auto = resolve_serving_mesh("auto")
    assert auto is not None and auto.devices.size == 8
    with pytest.raises(ValueError):
        resolve_serving_mesh("bogus")


def test_kv_cache_sharding_falls_back_when_indivisible():
    from vitron_tpu.models.llm import llama

    mesh = serving_mesh(8)  # tensor=2
    cfg = llama.LlamaConfig.tiny()
    odd = __import__("dataclasses").replace(cfg, num_kv_heads=3)
    sh = kv_cache_shardings(mesh, odd)
    assert sh.k.spec == jax.sharding.PartitionSpec()
    even = __import__("dataclasses").replace(cfg, num_kv_heads=4)
    sh2 = kv_cache_shardings(mesh, even)
    assert "tensor" in str(sh2.k.spec)
