"""Continuous-batching serving: co-batched decode parity + occupancy.

The reference has no serving stack (SURVEY §1 L6: one Gradio queue);
these tests pin the new surface: N concurrent /chat clients share decode
chunks through one paged-KV program (runtime/batching.py) instead of
serializing single-stream generations.
"""
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.batching import ContinuousBatcher
from vitron_tpu.runtime.engine import VitronEngine
from vitron_tpu.runtime.generation import SamplingConfig
from vitron_tpu.runtime.system import VitronSystem


class DemoTok:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


@pytest.fixture(scope="module")
def engine():
    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    return VitronEngine(params, cfg, DemoTok())


def test_batched_greedy_matches_single_stream(engine):
    """One request through the batcher == the single-stream chunked path
    (greedy; paged==dense parity is pinned in test_paged_cache.py)."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12)
    single = engine.chat("hello there", sampling=sampling)
    batcher = ContinuousBatcher(engine.generator.params, engine.generator.cfg,
                                chunk=4, num_blocks=64)
    engine.batcher = batcher
    try:
        batched = engine.chat("hello there", sampling=sampling)
    finally:
        engine.batcher = None
        batcher.close()
    assert batched["raw"] == single["raw"]


def test_concurrent_jobs_cobatch(engine):
    """A burst of 4 greedy requests is admitted together and decodes with
    mean batch occupancy > 1.5; every request matches its solo output."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=10)
    prompts = [f"prompt number {i} words" for i in range(4)]
    solo = [engine.chat(p, sampling=sampling)["raw"] for p in prompts]

    batcher = ContinuousBatcher(engine.generator.params, engine.generator.cfg,
                                chunk=4, num_blocks=128)
    engine.batcher = batcher
    results = [None] * 4

    def run(i):
        results[i] = engine.chat(prompts[i], sampling=sampling)["raw"]

    try:
        threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        stats = batcher.stats()
    finally:
        engine.batcher = None
        batcher.close()
    assert results == solo
    assert stats["admitted"] == 4 and stats["finished"] == 4
    assert stats["mean_batch_occupancy"] > 1.5, stats
    assert 0 < stats["slot_efficiency"] <= 1


def test_mixed_sampling_cobatch(engine):
    """Greedy and nucleus-sampled rows share one chunk program."""
    batcher = ContinuousBatcher(engine.generator.params, engine.generator.cfg,
                                chunk=4, num_blocks=128)
    engine.batcher = batcher
    out = {}

    def run(name, sampling):
        out[name] = engine.chat("mixed batch", sampling=sampling,
                                rng=jax.random.PRNGKey(3))["raw"]

    try:
        threads = [
            threading.Thread(target=run, args=(
                "greedy", SamplingConfig(greedy=True, max_new_tokens=8))),
            threading.Thread(target=run, args=(
                "sampled", SamplingConfig(temperature=0.9, top_p=0.9,
                                          max_new_tokens=8))),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        engine.batcher = None
        batcher.close()
    assert len(out) == 2
    assert all(isinstance(v, str) and v for v in out.values())


def test_staged_admission_matches_single_stream(engine):
    """A LONG prompt (pad bucket > prefill_chunk) goes through the staged
    admission path (embed program + cache-offset prefill chunks) and must
    produce exactly the single-stream greedy output."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12)
    prompt = " ".join(f"w{i}" for i in range(200))  # seq ~201 -> pad 256
    single = engine.chat(prompt, sampling=sampling)
    batcher = ContinuousBatcher(engine.generator.params, engine.generator.cfg,
                                chunk=4, num_blocks=128, prefill_chunk=128)
    engine.batcher = batcher
    try:
        batched = engine.chat(prompt, sampling=sampling)
        trace = list(batcher._trace)
    finally:
        engine.batcher = None
        batcher.close()
    assert batched["raw"] == single["raw"]
    assert trace.count("admit_embed") == 1, trace
    assert trace.count("admit_chunk") == 2, trace  # ceil(201/128)
    assert "admit_fused" not in trace


def test_staged_admission_interleaves_with_decode(engine):
    """While one stream decodes, a long-prompt admission advances one
    prefill chunk per loop iteration WITH a decode chunk in between — the
    active stream's cadence is delayed by at most one admission step per
    decode chunk, never the whole prefill (r4 stall: the full multimodal
    prefill ran inline on the device loop)."""
    batcher = ContinuousBatcher(engine.generator.params, engine.generator.cfg,
                                chunk=4, num_blocks=256, prefill_chunk=128)
    engine.batcher = batcher
    long_prompt = " ".join(f"w{i}" for i in range(300))  # pad 384 -> 3 chunks
    out = {}

    def run(name, prompt, n):
        out[name] = engine.chat(
            prompt, sampling=SamplingConfig(greedy=True,
                                            max_new_tokens=n))["raw"]

    try:
        t1 = threading.Thread(target=run, args=("short", "hello stream", 64))
        t1.start()
        t2 = threading.Thread(target=run, args=("long", long_prompt, 8))
        t2.start()
        t1.join(timeout=600)
        t2.join(timeout=600)
        trace = list(batcher._trace)
        stats = batcher.stats()
    finally:
        engine.batcher = None
        batcher.close()
    assert out["short"] and out["long"]
    # every admission step of the long request has a decode chunk next to
    # it: no two admit events are adjacent once a stream is active
    admit_idx = [i for i, e in enumerate(trace)
                 if e.startswith("admit_") and i > trace.index("decode")]
    assert admit_idx, trace
    for a, b in zip(admit_idx, admit_idx[1:]):
        assert b - a >= 2, (a, b, trace)  # a decode ran in between
    assert stats["admit_steps"] >= 4  # fused(short) + embed + 3 chunks
    assert stats["admit_step_s_max"] > 0


def test_serve_stats_reports_batching():
    """The HTTP server co-batches concurrent clients and /stats exposes
    the occupancy telemetry."""
    from vitron_tpu.apps.serve import serve

    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    system = VitronSystem(VitronEngine(params, cfg, DemoTok()))
    srv = serve(system, host="127.0.0.1", port=0, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"

        def post(i, results):
            payload = json.dumps({"prompt": f"client {i} asks",
                                  "greedy": True,
                                  "max_new_tokens": 8}).encode()
            req = urllib.request.Request(
                base + "/chat", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = json.loads(r.read())

        results = [None] * 4
        threads = [threading.Thread(target=post, args=(i, results))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None and r.get("raw") for r in results), results

        with urllib.request.urlopen(base + "/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert "batching" in stats
        b = stats["batching"]
        assert b["admitted"] == 4 and b["finished"] == 4
        assert b["mean_batch_occupancy"] > 1.5, b
    finally:
        srv.shutdown()
