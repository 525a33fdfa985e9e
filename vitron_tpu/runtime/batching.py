"""Continuous-batching serving: concurrent chat requests co-batch decode.

The reference has no serving stack at all (one Gradio queue running HF
generate per request, reference app.py:562-571); r3's ServingPipeline
pipelined host prep against device work but still decoded one request at a
time, so N concurrent clients got 1x single-stream aggregate throughput.

Single-token decode is HBM-bound: a step streams the full weight set to
produce ONE token per sequence. Decoding B sequences in one program streams
the weights ONCE for B tokens — aggregate throughput scales nearly linearly
with occupancy until the batch turns compute-bound. `ContinuousBatcher`
turns that into a serving loop:

- handler threads `submit()` prepared requests (splice plan + media) and
  block on a Future;
- ONE device loop thread owns all LLM programs: it admits queued requests
  (each admission = one multimodal spliced prefill into a dense cache,
  scattered into PagedServer pool blocks), then decodes `chunk` tokens for
  every active sequence in one jitted program (PagedServer.step_n with
  per-row temperature/top_p/greedy sampling);
- sequences join/leave at chunk boundaries (the continuous-batching slot
  granularity); EOS / keyword-stop / budget are enforced host-side between
  chunks exactly like the single-stream chunked decode path
  (runtime/generation.py _generate_chunked).

Trade-offs vs the single-stream path (both documented in docs/PERF.md):
sampled requests share per-step PRNG keys with their chunk-mates, so
stochastic outputs are not bitwise-reproducible across batch schedules; and
prompt-lookup speculative decode (runtime/speculative.py) is not used —
speculation pays when ONE stream must saturate HBM alone, co-batching gets
the same weight-reuse from real parallel work instead.
"""
from __future__ import annotations

import concurrent.futures
import dataclasses
import queue
import threading
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class _Job:
    arrays: Dict[str, Any]
    seq_len: int
    sampling: Any
    stopper: Any
    rng: Any
    future: "concurrent.futures.Future"
    sid: Optional[int] = None
    out: Optional[List[int]] = None


class ContinuousBatcher:
    """Owns the LLM device loop for a serving process.

    params/cfg are the full Vitron tree + config (the LLM sub-tree drives
    the paged decode pool). Thread-safe `submit`; one daemon loop thread.
    """

    def __init__(self, params, cfg, num_blocks: int = 512,
                 block_size: int = 16, chunk: int = 16, max_active: int = 8,
                 seed: int = 0, mesh=None):
        import jax

        from vitron_tpu.models.llm.paged_cache import PagedServer

        self.params = params
        self.cfg = cfg
        llm_params = params["llm"] if "llm" in params else params
        self.server = PagedServer(llm_params, cfg.llm, num_blocks=num_blocks,
                                  block_size=block_size)
        # multi-chip serving: pool KV heads on `tensor`, dense prefill
        # caches placed on the mesh (runtime/sharded_serving.py; params are
        # expected to be mesh-sharded already by install_mesh)
        self._cache_sharding = None
        if mesh is not None:
            from vitron_tpu.runtime.sharded_serving import (
                kv_cache_shardings, paged_pool_shardings)

            pool_sh = paged_pool_shardings(mesh, cfg.llm)
            self.server.pool.k = jax.device_put(self.server.pool.k, pool_sh)
            self.server.pool.v = jax.device_put(self.server.pool.v, pool_sh)
            self._cache_sharding = kv_cache_shardings(mesh, cfg.llm)
        self.chunk = chunk
        self.max_active = max_active
        self._queue: "queue.Queue[_Job]" = queue.Queue()
        self._active: Dict[int, _Job] = {}
        self._rng = jax.random.PRNGKey(seed)
        self._prefill = jax.jit(self._prefill_fn)
        self._lock = threading.Lock()
        self._stats = {"chunks": 0, "slot_tokens": 0, "emitted_tokens": 0,
                       "admitted": 0, "finished": 0, "batch_sum": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vitron-batcher")
        self._thread.start()

    # --------------------------------------------------------- device fns

    def _prefill_fn(self, params, token_ids, media_idx, use_media, positions,
                    attn_mask, images, videos, block_perm, region_boxes,
                    region_block_idx, cache, seq_len, rng, temp, top_p,
                    greedy):
        import jax.numpy as jnp

        from vitron_tpu.kernels.quantization import promote_int4
        from vitron_tpu.models import vitron_model
        from vitron_tpu.models.llm.paged_cache import sample_token_batched

        params = promote_int4(params)
        logits, cache = vitron_model.forward(
            params, self.cfg, token_ids, media_idx, use_media, positions,
            attn_mask, images=images, videos=videos, block_perm=block_perm,
            region_boxes=region_boxes, region_block_idx=region_block_idx,
            cache=cache)
        last = (seq_len - 1).astype(jnp.int32)
        next_logits = jnp.take_along_axis(
            logits, last[:, None, None], axis=1)[:, 0]
        tok0 = sample_token_batched(rng, next_logits, temp, top_p, greedy)
        return tok0[0], cache.k, cache.v

    # -------------------------------------------------------------- API

    def submit(self, plan, images=None, videos=None, block_perm=None,
               region_boxes=None, sampling=None, stopper=None,
               rng=None) -> "concurrent.futures.Future":
        """Enqueue one single-row generation; Future resolves to the new
        token ids (stop semantics identical to Generator._generate_chunked)."""
        import jax.numpy as jnp

        from vitron_tpu.runtime.generation import SamplingConfig

        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        sampling = sampling or SamplingConfig()
        b, _ = plan.token_ids.shape
        if b != 1:
            raise ValueError("ContinuousBatcher co-batches single-row "
                             "requests; pass rows separately")
        kwargs = dict(
            token_ids=jnp.asarray(plan.token_ids),
            media_idx=jnp.asarray(plan.media_idx),
            use_media=jnp.asarray(plan.use_media),
            positions=jnp.asarray(plan.position_ids),
            attn_mask=jnp.asarray(plan.attention_mask),
            images=images, videos=videos,
            block_perm=jnp.asarray(block_perm) if block_perm is not None else None,
            region_boxes=None, region_block_idx=None,
        )
        if (plan.region_blocks is not None and len(plan.region_blocks)
                and region_boxes is not None):
            kwargs["region_boxes"] = jnp.asarray(region_boxes, jnp.float32)
            kwargs["region_block_idx"] = jnp.asarray(plan.region_blocks)
        job = _Job(arrays=kwargs, seq_len=int(plan.seq_lens[0]),
                   sampling=sampling, stopper=stopper, rng=rng,
                   future=concurrent.futures.Future())
        self._queue.put(job)
        return job.future

    def stats(self) -> Dict[str, Any]:
        """Occupancy telemetry for /stats: mean co-batched sequences per
        chunk and slot efficiency (emitted / decoded slots)."""
        with self._lock:
            s = dict(self._stats)
        chunks = max(s["chunks"], 1)
        return {
            **s,
            "active": len(self._active),
            "queued": self._queue.qsize(),
            "chunk_size": self.chunk,
            "mean_batch_occupancy": round(s["batch_sum"] / chunks, 2),
            "slot_efficiency": round(
                s["emitted_tokens"] / max(s["slot_tokens"], 1), 3),
        }

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
        for job in list(self._active.values()):
            if not job.future.done():
                job.future.set_exception(RuntimeError("batcher closed"))
        while True:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            if not job.future.done():
                job.future.set_exception(RuntimeError("batcher closed"))

    # ------------------------------------------------------------- loop

    def _loop(self) -> None:
        while not self._stop.is_set():
            admitted = self._admit_pending()
            if not self._active:
                if not admitted:
                    try:
                        job = self._queue.get(timeout=0.05)
                    except queue.Empty:
                        continue
                    self._admit(job)
                continue
            try:
                self._decode_chunk()
            except Exception as e:  # fail active jobs, keep serving
                for sid, job in list(self._active.items()):
                    if not job.future.done():
                        job.future.set_exception(e)
                    self.server.finish(sid)
                self._active.clear()

    def _admit_pending(self) -> bool:
        admitted = False
        while len(self._active) < self.max_active:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            self._admit(job)
            admitted = True
        return admitted

    def _admit(self, job: _Job) -> None:
        import jax
        import jax.numpy as jnp

        from vitron_tpu.models.llm import llama

        try:
            s = job.sampling
            greedy = bool(s.greedy or s.temperature == 0.0)
            if job.rng is not None:
                rng = job.rng
            else:
                self._rng, rng = jax.random.split(self._rng)
            pad_len = job.arrays["token_ids"].shape[1]
            # dense prefill cache sized to the pad bucket; block-aligned
            # import needs ceil(seq_len/bs)*bs <= pad_len, which holds since
            # the planner buckets pad_len to a multiple of 128
            cache = llama.KVCache.create(self.cfg.llm, 1, max_len=pad_len)
            if self._cache_sharding is not None:
                cache = jax.device_put(cache, self._cache_sharding)
            tok0, ck, cv = self._prefill(
                self.params, cache=cache,
                seq_len=jnp.asarray([job.seq_len], jnp.int32), rng=rng,
                temp=jnp.asarray([s.temperature], jnp.float32),
                top_p=jnp.asarray([s.top_p], jnp.float32),
                greedy=jnp.asarray([greedy], bool), **job.arrays)
            tok0 = int(tok0)
            sid = self.server.add_from_cache(ck, cv, job.seq_len, tok0)
            job.sid = sid
            job.out = [tok0]
            with self._lock:
                self._stats["admitted"] += 1
            if self._job_done_after(job, tok0):
                self._finish(job)
            else:
                self._active[sid] = job
        except Exception as e:
            if not job.future.done():
                job.future.set_exception(e)

    def _job_done_after(self, job: _Job, tok: int) -> bool:
        s = job.sampling
        if tok in s.eos_ids:
            return True
        if job.stopper is not None and job.stopper.should_stop(job.out):
            return True
        return len(job.out) >= s.max_new_tokens

    def _finish(self, job: _Job) -> None:
        if job.sid in self._active:
            del self._active[job.sid]
        self.server.finish(job.sid)
        with self._lock:
            self._stats["finished"] += 1
        if not job.future.done():
            job.future.set_result(list(job.out))

    def _decode_chunk(self) -> None:
        import jax

        ids = sorted(self._active)
        b = len(ids)
        sampling: Dict[Any, Any] = {}
        for sid in ids:
            s = self._active[sid].sampling
            sampling[sid] = (s.temperature, s.top_p,
                             bool(s.greedy or s.temperature == 0.0))
        self._rng, rng = jax.random.split(self._rng)
        sampling["rng"] = rng
        toks = self.server.step_n(self.chunk, sampling=sampling)
        emitted = 0
        for sid, ts in toks.items():
            job = self._active.get(sid)
            if job is None:
                continue
            done = False
            for t in ts:
                job.out.append(int(t))
                emitted += 1
                if self._job_done_after(job, int(t)):
                    done = True
                    break
            if done:
                self._finish(job)
        with self._lock:
            self._stats["chunks"] += 1
            self._stats["batch_sum"] += b
            self._stats["slot_tokens"] += b * self.chunk
            self._stats["emitted_tokens"] += emitted
