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
  (runtime/generation.py _generate_chunked);
- admission of LONG prompts is STAGED so it never stalls active streams
  for the whole prefill: one program computes the spliced embeddings
  (media encode + splice), then the decoder prefill runs in
  `prefill_chunk`-token cache-offset chunks (llama.forward's cache path),
  and the loop interleaves ONE decode chunk between admission steps. A
  2048-token video admission thus delays co-batched decode by at most one
  embed program + one prefill chunk per decode chunk, instead of the full
  prompt. Prompts that fit in one chunk keep the fused single-program
  admission (encode+splice+prefill+sample). Admission-stall telemetry
  (`admit_step_s_max`, the longest single admission device step) is in
  `stats()` next to occupancy.

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
import math
import queue
import threading
import time
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


@dataclasses.dataclass
class _Admission:
    """In-flight staged admission: spliced embeds computed, prefill
    advancing one cache-offset chunk per device-loop iteration."""
    job: _Job
    embeds: Any          # [1, pad_len, H] device array
    positions: Any       # [1, pad_len]
    attn_mask: Any       # [1, pad_len]
    cache: Any           # llama.KVCache, index at chunk frontier
    rng: Any
    chunk: int           # prefill chunk size (divides pad_len)
    n_chunks: int        # ceil(seq_len / chunk) — padding-only chunks skipped
    i: int = 0


class ContinuousBatcher:
    """Owns the LLM device loop for a serving process.

    params/cfg are the full Vitron tree + config (the LLM sub-tree drives
    the paged decode pool). Thread-safe `submit`; one daemon loop thread.
    """

    def __init__(self, params, cfg, num_blocks: int = 512,
                 block_size: int = 16, chunk: int = 16, max_active: int = 8,
                 seed: int = 0, mesh=None, prefill_chunk: int = 256):
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
        self.prefill_chunk = prefill_chunk
        self._queue: "queue.Queue[_Job]" = queue.Queue()
        self._active: Dict[int, _Job] = {}
        self._admitting: Optional[_Admission] = None
        self._rng = jax.random.PRNGKey(seed)
        self._prefill = jax.jit(self._prefill_fn)
        self._embed = jax.jit(self._embed_fn)
        self._chunk_prefills: Dict[int, Any] = {}
        self._trace: List[str] = []       # device-loop event log (tests)
        self._lock = threading.Lock()
        self._stats = {"chunks": 0, "slot_tokens": 0, "emitted_tokens": 0,
                       "admitted": 0, "finished": 0, "batch_sum": 0,
                       "admit_steps": 0, "admit_step_s_sum": 0.0,
                       "admit_step_s_max": 0.0}
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

    def _embed_fn(self, params, token_ids, media_idx, use_media, positions,
                  attn_mask, images, videos, block_perm, region_boxes,
                  region_block_idx):
        """Stage 1 of chunked admission: full spliced embeddings in one
        program (towers + projector + splice, no decoder)."""
        del positions, attn_mask  # same kwargs dict as _prefill_fn
        from vitron_tpu.kernels.quantization import promote_int4
        from vitron_tpu.models import vitron_model

        params = promote_int4(params)
        return vitron_model.spliced_embeds(
            params, self.cfg, token_ids, media_idx, use_media,
            images=images, videos=videos, block_perm=block_perm,
            region_boxes=region_boxes, region_block_idx=region_block_idx)

    def _get_chunk_prefill(self, p: int):
        """Stage 2 program: one `p`-token cache-offset prefill chunk
        (llama.forward writes K/V at cache.index and attends the window).
        Samples at seq_len-1 every chunk — only the final chunk's sample is
        used, but one program then serves every chunk position."""
        if p in self._chunk_prefills:
            return self._chunk_prefills[p]
        import jax
        import jax.numpy as jnp

        from vitron_tpu.kernels.quantization import promote_int4
        from vitron_tpu.models.llm import llama
        from vitron_tpu.models.llm.paged_cache import sample_token_batched

        def _step(params, embeds, positions, attn_mask, cache, start,
                  seq_len, rng, temp, top_p, greedy):
            params = promote_int4(params)
            h = embeds.shape[-1]
            emb_c = jax.lax.dynamic_slice(embeds, (0, start, 0), (1, p, h))
            pos_c = jax.lax.dynamic_slice(positions, (0, start), (1, p))
            mask_c = jax.lax.dynamic_slice(attn_mask, (0, start), (1, p))
            logits, cache = llama.forward(
                params["llm"] if "llm" in params else params, self.cfg.llm,
                emb_c, pos_c, attn_mask=mask_c, cache=cache)
            idx = jnp.clip(seq_len - 1 - start, 0, p - 1).astype(jnp.int32)
            next_logits = jnp.take_along_axis(
                logits, idx[None, None, None], axis=1)[:, 0]
            tok = sample_token_batched(rng, next_logits, temp, top_p, greedy)
            return tok[0], cache

        fn = jax.jit(_step, donate_argnums=(4,))
        self._chunk_prefills[p] = fn
        return fn

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
            "admit_step_s_mean": round(
                s["admit_step_s_sum"] / max(s["admit_steps"], 1), 4),
            "admit_step_s_max": round(s["admit_step_s_max"], 4),
        }

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
        if self._admitting is not None:
            job = self._admitting.job
            if not job.future.done():
                job.future.set_exception(RuntimeError("batcher closed"))
            self._admitting = None
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
            admitted = False
            if self._admitting is None:
                admitted = self._admit_pending()
            if self._admitting is not None:
                self._admit_step()
            if self._active:
                try:
                    self._decode_chunk()
                except Exception as e:  # fail active jobs, keep serving
                    for sid, job in list(self._active.items()):
                        if not job.future.done():
                            job.future.set_exception(e)
                        self.server.finish(sid)
                    self._active.clear()
            elif self._admitting is None and not admitted:
                try:
                    job = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                self._begin(job)

    def _admit_pending(self) -> bool:
        """Admit queued jobs up to capacity. Short prompts admit inline
        (one fused program); the first LONG prompt becomes the staged
        admission and stops the drain — its prefill chunks interleave with
        decode on subsequent loop iterations."""
        admitted = False
        while (len(self._active) < self.max_active
               and self._admitting is None):
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            self._begin(job)
            admitted = True
        return admitted

    def _begin(self, job: _Job) -> None:
        pad_len = job.arrays["token_ids"].shape[1]
        if pad_len <= self.prefill_chunk:
            self._admit(job)
        else:
            self._start_admission(job)

    def _admit_rng_sampling(self, job: _Job):
        import jax

        s = job.sampling
        greedy = bool(s.greedy or s.temperature == 0.0)
        if job.rng is not None:
            rng = job.rng
        else:
            self._rng, rng = jax.random.split(self._rng)
        return rng, greedy

    def _timed_admit_step(self, tag: str, fn):
        """Run one admission device step synchronously and record its wall
        time as admission-stall telemetry (the loop is host-synchronous
        anyway: decode chunks return host tokens every iteration)."""
        import jax

        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        with self._lock:
            self._stats["admit_steps"] += 1
            self._stats["admit_step_s_sum"] += dt
            self._stats["admit_step_s_max"] = max(
                self._stats["admit_step_s_max"], dt)
        self._trace_event(tag)
        return out

    def _trace_event(self, tag: str) -> None:
        self._trace.append(tag)
        if len(self._trace) > 2048:
            del self._trace[:1024]

    def _admit(self, job: _Job) -> None:
        import jax.numpy as jnp

        from vitron_tpu.models.llm import llama

        try:
            s = job.sampling
            rng, greedy = self._admit_rng_sampling(job)
            pad_len = job.arrays["token_ids"].shape[1]
            # dense prefill cache sized to the pad bucket; block-aligned
            # import needs ceil(seq_len/bs)*bs <= pad_len, which holds since
            # the planner buckets pad_len to a multiple of 128
            cache = llama.KVCache.create(self.cfg.llm, 1, max_len=pad_len)
            if self._cache_sharding is not None:
                import jax

                cache = jax.device_put(cache, self._cache_sharding)
            tok0, ck, cv = self._timed_admit_step(
                "admit_fused", lambda: self._prefill(
                    self.params, cache=cache,
                    seq_len=jnp.asarray([job.seq_len], jnp.int32), rng=rng,
                    temp=jnp.asarray([s.temperature], jnp.float32),
                    top_p=jnp.asarray([s.top_p], jnp.float32),
                    greedy=jnp.asarray([greedy], bool), **job.arrays))
            self._activate(job, int(tok0), ck, cv)
        except Exception as e:
            if not job.future.done():
                job.future.set_exception(e)

    def _start_admission(self, job: _Job) -> None:
        """Stage a long-prompt admission: compute spliced embeddings now,
        leave the decoder prefill to per-iteration chunks."""
        import jax
        import jax.numpy as jnp

        from vitron_tpu.models.llm import llama

        try:
            rng, _ = self._admit_rng_sampling(job)
            pad_len = job.arrays["token_ids"].shape[1]
            # largest power-of-two-ish chunk <= prefill_chunk dividing the
            # pad bucket (buckets are multiples of 128, so this is >= 128)
            p = math.gcd(pad_len, self.prefill_chunk)
            embeds = self._timed_admit_step(
                "admit_embed", lambda: self._embed(self.params, **job.arrays))
            cache = llama.KVCache.create(self.cfg.llm, 1, max_len=pad_len)
            if self._cache_sharding is not None:
                cache = jax.device_put(cache, self._cache_sharding)
            self._admitting = _Admission(
                job=job, embeds=embeds,
                positions=job.arrays["positions"],
                attn_mask=job.arrays["attn_mask"],
                cache=cache, rng=rng, chunk=p,
                n_chunks=max(1, -(-job.seq_len // p)))
        except Exception as e:
            if not job.future.done():
                job.future.set_exception(e)

    def _admit_step(self) -> None:
        """Advance the staged admission by ONE prefill chunk; on the final
        chunk, sample tok0 and activate the sequence."""
        import jax.numpy as jnp

        adm = self._admitting
        job = adm.job
        try:
            s = job.sampling
            greedy = bool(s.greedy or s.temperature == 0.0)
            fn = self._get_chunk_prefill(adm.chunk)
            tok, cache = self._timed_admit_step(
                "admit_chunk", lambda: fn(
                    self.params, adm.embeds, adm.positions, adm.attn_mask,
                    adm.cache, jnp.int32(adm.i * adm.chunk),
                    jnp.asarray(job.seq_len, jnp.int32), adm.rng,
                    jnp.asarray([s.temperature], jnp.float32),
                    jnp.asarray([s.top_p], jnp.float32),
                    jnp.asarray([greedy], bool)))
            adm.cache = cache
            adm.i += 1
            if adm.i >= adm.n_chunks:
                self._admitting = None
                self._activate(job, int(tok), cache.k, cache.v)
        except Exception as e:
            self._admitting = None
            if not job.future.done():
                job.future.set_exception(e)

    def _activate(self, job: _Job, tok0: int, ck, cv) -> None:
        sid = self.server.add_from_cache(ck, cv, job.seq_len, tok0)
        job.sid = sid
        job.out = [tok0]
        with self._lock:
            self._stats["admitted"] += 1
        if self._job_done_after(job, tok0):
            self._finish(job)
        else:
            self._active[sid] = job

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
        self._trace_event("decode")
