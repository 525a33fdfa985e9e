"""Pipelining overlap + diffusion training losses."""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.diffusion.losses import diffusion_loss, v_to_eps
from vitron_tpu.models.diffusion.samplers import DiffusionSchedule
from vitron_tpu.runtime.pipeline import (
    HostPrefetcher,
    PipelinedRunner,
    ServingPipeline,
)


class _StubSystem:
    """prepare/chat_prepared with realistic think-times (host decode vs
    device generate)."""

    def __init__(self, prep_s: float, dev_s: float):
        self.prep_s = prep_s
        self.dev_s = dev_s

    def prepare(self, msg, image=None, video=None, region_box=None):
        time.sleep(self.prep_s)
        return {"msg": msg, "media": [], "region_boxes": None,
                "image": image, "video": video}

    def chat_prepared(self, prepared, **kw):
        time.sleep(self.dev_s)
        return {"status": "chat", "text": prepared["msg"]}


def test_serving_pipeline_overlap_throughput():
    """VERDICT r2 #3 'done' bar: multi-request throughput >= 1.3x serial —
    request N+1's host preprocessing must overlap device work for N."""
    n = 8
    sys_ = _StubSystem(prep_s=0.05, dev_s=0.05)

    t0 = time.perf_counter()
    serial = [sys_.chat_prepared(sys_.prepare(f"q{i}")) for i in range(n)]
    t_serial = time.perf_counter() - t0

    pipe = ServingPipeline(sys_, num_workers=4)
    t0 = time.perf_counter()
    futs = [pipe.submit(f"q{i}") for i in range(n)]
    piped = [f.result() for f in futs]
    t_piped = time.perf_counter() - t0
    pipe.close()

    assert [r["text"] for r in piped] == [r["text"] for r in serial]
    assert t_piped < t_serial / 1.3, (t_piped, t_serial)


def test_serving_pipeline_device_serialized():
    """Only one chat_prepared may run at a time (TPU program order)."""
    import threading

    active = []
    peak = []
    lock = threading.Lock()

    class S(_StubSystem):
        def chat_prepared(self, prepared, **kw):
            with lock:
                active.append(1)
                peak.append(len(active))
            time.sleep(0.02)
            with lock:
                active.pop()
            return {"status": "chat", "text": prepared["msg"]}

    pipe = ServingPipeline(S(0.0, 0.0), num_workers=4)
    futs = [pipe.submit(f"q{i}") for i in range(6)]
    [f.result() for f in futs]
    pipe.close()
    assert max(peak) == 1


def test_prefetcher_order_and_overlap():
    def prepare(i):
        time.sleep(0.03)
        return i * 2

    pf = HostPrefetcher(prepare, num_workers=4, depth=4)
    t0 = time.perf_counter()
    out = list(pf.map(range(8)))
    dt = time.perf_counter() - t0
    assert out == [i * 2 for i in range(8)]
    assert dt < 8 * 0.03 * 0.9  # meaningfully faster than serial
    pf.close()


def test_pipelined_runner_overlaps_stages():
    def prepare(i):
        time.sleep(0.03)
        return i

    def compute(i):
        time.sleep(0.03)
        return i + 100

    r = PipelinedRunner(prepare, compute, num_workers=2, depth=2)
    t0 = time.perf_counter()
    out = list(r.run(range(6)))
    dt = time.perf_counter() - t0
    assert out == [i + 100 for i in range(6)]
    # serial would be 6*(0.03+0.03)=0.36s; pipelined ~0.21s
    assert dt < 0.33
    r.close()


def test_prefetcher_propagates_errors():
    def prepare(i):
        if i == 2:
            raise ValueError("bad item")
        return i

    pf = HostPrefetcher(prepare, num_workers=2, depth=2)
    with pytest.raises(ValueError, match="bad item"):
        list(pf.map(range(4)))


def test_diffusion_loss_modes():
    sched = DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 4))
    t = jnp.asarray([10, 500])

    def perfect_eps_model(noise):
        return lambda xt, tt: noise

    # a model that predicts the exact noise has ~zero eps loss
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    # reproduce the internal noise by passing the same rng
    loss = diffusion_loss(lambda xt, tt: xt * 0, x0, t, jax.random.PRNGKey(1),
                          sched, mean_type="eps")
    assert loss.shape == (2,)
    assert bool(jnp.isfinite(loss).all())
    for lt in ("l1", "charbonnier"):
        l = diffusion_loss(lambda xt, tt: xt * 0, x0, t, jax.random.PRNGKey(1),
                           sched, mean_type="eps", loss_type=lt)
        assert bool(jnp.isfinite(l).all())
    # div loss only adds for video eps models
    l_div = diffusion_loss(lambda xt, tt: xt * 0, x0, t, jax.random.PRNGKey(1),
                           sched, mean_type="eps", use_div_loss=True)
    assert bool((l_div >= loss).all())


def test_v_parameterization_roundtrip():
    """v target -> eps conversion is consistent with the loss target."""
    sched = DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.asarray([300])
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    ac = jnp.asarray(sched.alphas_cumprod)[t].reshape(-1, 1, 1, 1)
    xt = jnp.sqrt(ac) * x0 + jnp.sqrt(1 - ac) * noise
    v = jnp.sqrt(ac) * noise - jnp.sqrt(1 - ac) * x0
    eps = v_to_eps(v, xt, t, sched)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise),
                               rtol=1e-4, atol=1e-5)
