"""Autoregressive generation engine.

Replaces the reference's HF `model.generate(...)` hot loop
(reference: app.py:562-571, inference_image.py:52-61) with:

- one jitted multimodal **prefill** over the spliced embeddings,
- one jitted single-token **decode step** reused for every new token
  (static shapes: the preallocated KV cache absorbs sequence growth),
- device-side temperature/top-p sampling (reference sampling params,
  app.py:566-568),
- host-side stop handling: EOS ids + `KeywordStopper` string matching
  (reference mm_utils.py:146-177), checked every `stop_check_every` steps so
  the device never stalls on per-token host sync,
- `generate_scan`: a fully `lax.scan`-compiled fixed-length variant for
  benchmarking (zero host round-trips).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models import vitron_model
from vitron_tpu.models.llm import llama


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Reference defaults: app.py:564-571 (temperature slider, top_p, 1024)."""

    temperature: float = 0.2
    top_p: float = 0.7
    max_new_tokens: int = 1024
    greedy: bool = False
    eos_ids: tuple = (2,)


def _has_packed_int4(params) -> bool:
    """True if any leaf dict is a packed-int4 weight ({'q4', 's'})."""
    found = [False]

    def visit(x):
        if isinstance(x, dict) and "q4" in x:
            found[0] = True

    jax.tree.map(visit, params,
                 is_leaf=lambda x: isinstance(x, dict) and "q4" in x)
    return found[0]


def sample_token(rng: jax.Array, logits: jax.Array, temperature: float,
                 top_p: float, greedy: bool) -> jax.Array:
    """logits: [B, V] -> token ids [B]. Nucleus (top-p) + temperature."""
    if greedy or temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.asarray(temperature, logits.dtype)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


class Generator:
    """Holds jitted prefill/decode programs for one (config, batch, lengths)
    bucket; call `generate` per request."""

    def __init__(self, params: Dict[str, Any], cfg: vitron_model.VitronConfig,
                 tokenizer=None, donate_cache: bool = True):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # multi-chip serving (runtime/sharded_serving.install_mesh): a
        # KVCache pytree of NamedShardings; fresh caches are device_put onto
        # the mesh so they compose with mesh-sharded params in one program
        self.cache_sharding = None

        def _prefill(params, **kw):
            return vitron_model.forward(params, cfg, **kw)

        self._prefill = jax.jit(_prefill)

        def _step(params, token, pos, cache, rng, temperature, top_p, greedy):
            logits, cache = vitron_model.decode_step(params, cfg, token, pos, cache)
            nxt = sample_token(rng, logits[:, -1], temperature, top_p, greedy)
            return nxt[:, None], cache

        self._decode = jax.jit(_step, static_argnames=("temperature", "top_p", "greedy"),
                               donate_argnums=(3,) if donate_cache else ())

        self._chunk_fns: Dict[Any, Any] = {}
        self.last_spec_stats: Optional[Dict[str, int]] = None

    def _get_spec_fn(self, n_new, k, ngram, eos_ids):
        """Jitted prompt-lookup speculative decode loop (greedy, B=1):
        emits up to k+1 tokens per forward at ~1 forward's HBM cost
        (runtime/speculative.py). One program per (n_new, k, ngram, eos)."""
        key = ("spec", n_new, k, ngram, tuple(eos_ids))
        if key not in self._chunk_fns:
            from vitron_tpu.runtime.speculative import speculative_loop

            def _run(params, tok0, cache, prompt_ids, seq_len):
                from vitron_tpu.kernels.quantization import promote_int4

                return speculative_loop(
                    promote_int4(params), self.cfg, tok0, cache, prompt_ids,
                    seq_len, n_new, k=k, ngram=ngram, eos_ids=eos_ids)

            self._chunk_fns[key] = jax.jit(_run, donate_argnums=(2,))
        return self._chunk_fns[key]

    def _get_spec_seg_fns(self, n_new, k, ngram, eos_ids, seg):
        """Segmented variant for requests with a keyword stopper: the loop
        returns to the host every `seg` emitted tokens so the stopper can
        end generation early (the whole-budget program would always pay the
        full max_new_tokens latency on stop-string-terminated requests)."""
        key = ("specseg", n_new, k, ngram, tuple(eos_ids), seg)
        if key not in self._chunk_fns:
            from vitron_tpu.runtime import speculative as spec

            def _init(tok0, cache, prompt_ids, seq_len):
                return spec.spec_init_state(tok0, cache, prompt_ids, seq_len,
                                            n_new, k, eos_ids)

            def _seg(params, state, limit):
                from vitron_tpu.kernels.quantization import promote_int4

                return spec.speculative_segment(
                    promote_int4(params), self.cfg, state, seg, limit,
                    k=k, ngram=ngram, eos_ids=eos_ids)

            self._chunk_fns[key] = (jax.jit(_init, donate_argnums=(1,)),
                                    jax.jit(_seg, donate_argnums=(1,)))
        return self._chunk_fns[key]

    def _get_chunk_fn(self, chunk, temperature, top_p, greedy, eos_ids):
        """Jitted chunked decode: up to `chunk` tokens in ONE program with
        device-side EOS early exit (while_loop). Each tunnel dispatch costs
        ~1 ms, so per-token stepping taxes decode ~10%; chunking amortizes
        it AND lets int4 weights promote to native s4 once per chunk."""
        key = (chunk, temperature, top_p, greedy, tuple(eos_ids))
        if key not in self._chunk_fns:

            def _chunk(params, token, pos, cache, done, rng, limit):
                from vitron_tpu.kernels.quantization import promote_int4

                cfg = self.cfg
                params = promote_int4(params)
                eos = jnp.asarray(list(eos_ids) or [-1], jnp.int32)

                # lax.scan, NOT while_loop: the dynamic-trip-count loop cost
                # ~1 ms/step of synchronization on the tunnel chip (measured
                # r2, docs/PERF.md "Interactive serving"); the scan runs the
                # full chunk and masks tokens past EOS/limit with -1 — same
                # host-visible semantics, overshoot traded for pipelining
                def body(carry, i):
                    token, pos, cache, rng, done = carry
                    logits, cache = vitron_model.decode_step(
                        params, cfg, token, pos, cache)
                    rng, k = jax.random.split(rng)
                    nxt = sample_token(k, logits[:, -1], temperature, top_p,
                                       greedy)
                    emit = jnp.where(done | (i >= limit), -1,
                                     nxt).astype(jnp.int32)
                    done = done | (~done & (i < limit) &
                                   jnp.any(nxt[:, None] == eos[None, :], -1))
                    return (nxt[:, None], pos + 1, cache, rng, done), emit

                (token, pos, cache, rng, done), emits = jax.lax.scan(
                    body, (token, pos, cache, rng, done),
                    jnp.arange(chunk, dtype=jnp.int32))
                n = jnp.minimum(jnp.int32(chunk), limit)
                return token, pos, cache, done, emits.T, n

            self._chunk_fns[key] = jax.jit(_chunk, donate_argnums=(3,))
        return self._chunk_fns[key]

    def _run_spec_segments(self, params, state, row, rng, sampling, stopper,
                           decode_chunk: int, spec_k: int, spec_ngram: int,
                           extra_stats: Optional[Dict[str, Any]] = None):
        """Adaptive segmented speculation from an arbitrary decode frontier
        (post-prefill OR mid-stream probe upgrade). Falls back to plain
        chunked decode on the same cache when measured acceptance drops
        below break-even (VITRON_SPEC_TPF_MIN, docs/PERF.md)."""
        import os as _os

        seg = min(64, sampling.max_new_tokens)
        _, seg_fn = self._get_spec_seg_fns(
            sampling.max_new_tokens, spec_k, spec_ngram, sampling.eos_ids,
            seg)
        base = len(row)   # tokens that predate speculation
        forwards = 0
        tpf_min = float(_os.environ.get("VITRON_SPEC_TPF_MIN", "1.5"))
        stop = (row[-1] in sampling.eos_ids
                or (stopper is not None and stopper.should_stop(row)))
        fell_back = False
        while not stop and len(row) < sampling.max_new_tokens:
            limit = jnp.int32(sampling.max_new_tokens - len(row))
            toks, out_n, steps, state = seg_fn(params, state, limit)
            toks_host = np.asarray(toks)
            n, forwards = int(out_n), forwards + int(steps)
            if n == 0:
                if bool(np.asarray(state[8])):
                    break  # device done flag (EOS mid-previous-segment)
                # Defensive: a zero-emission segment WITHOUT the done flag
                # would silently truncate the generation (observed once as
                # a long-suite CPU flake, r5). The cache frontier in state
                # is exact, so finish the budget as plain chunked decode —
                # correct output, at worst a perf blip.
                fell_back = True
                break
            for t in toks_host[:n]:
                row.append(int(t))
                if (int(t) in sampling.eos_ids
                        or (stopper is not None
                            and stopper.should_stop(row))):
                    stop = True
                    break
            if (not stop and forwards >= 8
                    and (len(row) - base) / forwards < tpf_min):
                fell_back = True
                break
        if fell_back and len(row) < sampling.max_new_tokens:
            # low acceptance: resume as plain chunked decode on the
            # speculative cache (state carries the accepted frontier)
            last_tok, slot, pos_s = state[0], state[1], state[2]
            cache = llama.KVCache(k=state[3], v=state[4], index=slot,
                                  valid=state[5])
            out_tokens = [row]
            self._generate_chunked(
                jnp.asarray([[int(last_tok)]], jnp.int32),
                jnp.asarray([[int(pos_s)]], jnp.int32), cache,
                out_tokens, np.zeros(1, bool), rng, sampling, stopper,
                decode_chunk, record_first=False)
            row = out_tokens[0]
        self.last_spec_stats = {"emitted": len(row),
                                "forwards": forwards + 1,  # +prefill
                                "fell_back": fell_back,
                                **(extra_stats or {})}
        return row

    def _probe_generate(self, params, plan, token, pos, cache, rng, sampling,
                        stopper, decode_chunk: int, spec_k: int,
                        spec_ngram: int) -> List[int]:
        """Break-even-probed generation (the speculative default): first
        chunk decodes PLAIN, then hypothetical_tpf replays prompt-lookup
        acceptance on the emitted window at zero device cost. Low-acceptance
        (caption-style) requests thus run at exactly plain-decode speed;
        repetitive/quoting (protocol-style) requests upgrade to speculative
        segments for the remaining budget."""
        import os as _os

        from vitron_tpu.runtime import speculative as spec_mod

        eos = sampling.eos_ids
        row = [int(token[0, 0])]
        probe_stats = {"mode": "probe_plain", "probe_tpf": 0.0}
        if (row[0] in eos
                or (stopper is not None and stopper.should_stop(row))
                or sampling.max_new_tokens <= 1):
            self.last_spec_stats = {"emitted": len(row), "forwards": 1,
                                    "fell_back": False, **probe_stats}
            return row
        chunk_fn = self._get_chunk_fn(decode_chunk, sampling.temperature,
                                      sampling.top_p, sampling.greedy,
                                      sampling.eos_ids)
        rng, kk = jax.random.split(rng)
        limit = jnp.int32(sampling.max_new_tokens - 1)
        token, pos, cache, done_dev, emits, _ = chunk_fn(
            params, token, pos, cache, jnp.zeros(1, bool), kk, limit)
        stop = False
        for t in np.asarray(emits)[0]:
            t = int(t)
            if t < 0:
                break
            row.append(t)
            if (t in eos
                    or (stopper is not None and stopper.should_stop(row))):
                stop = True
                break
        tpf_hyp = spec_mod.hypothetical_tpf(
            plan.token_ids[0], int(plan.seq_lens[0]), row,
            k=spec_k, ngram=spec_ngram)
        probe_stats["probe_tpf"] = round(tpf_hyp, 3)
        if stop or bool(np.asarray(done_dev)[0]) \
                or len(row) >= sampling.max_new_tokens:
            self.last_spec_stats = {"emitted": len(row),
                                    "forwards": len(row),
                                    "fell_back": False, **probe_stats}
            return row
        tpf_min = float(_os.environ.get("VITRON_SPEC_TPF_MIN", "1.5"))
        if tpf_hyp < tpf_min:
            # stay plain: zero speculative device steps were taken
            out_tokens = [row]
            self._generate_chunked(token, pos, cache, out_tokens,
                                   np.zeros(1, bool), rng, sampling, stopper,
                                   decode_chunk, record_first=False)
            self.last_spec_stats = {"emitted": len(out_tokens[0]),
                                    "forwards": len(out_tokens[0]),
                                    "fell_back": False, **probe_stats}
            return out_tokens[0]
        probe_stats["mode"] = "probe_spec"
        state = spec_mod.spec_resume_state(
            row[-1], cache, np.asarray(plan.token_ids[0], np.int32),
            int(plan.seq_lens[0]), row, sampling.max_new_tokens, spec_k)
        return self._run_spec_segments(
            params, state, row, rng, sampling, stopper, decode_chunk,
            spec_k, spec_ngram, extra_stats=probe_stats)

    def generate(
        self,
        plan,
        images: Optional[jax.Array] = None,
        videos: Optional[jax.Array] = None,
        block_perm: Optional[np.ndarray] = None,
        region_boxes: Optional[np.ndarray] = None,
        sampling: SamplingConfig = SamplingConfig(),
        rng: Optional[jax.Array] = None,
        stopper=None,
        stop_check_every: int = 8,
        max_cache_len: Optional[int] = None,
        decode_chunk: Optional[int] = None,
        speculative: Optional[bool] = None,
        spec_k: int = 4,
        spec_ngram: int = 2,
        batcher=None,
    ) -> List[List[int]]:
        """Run prefill + decode for one planned batch; returns new token ids
        per row (stop sequences trimmed by the caller/stopper semantics).

        decode_chunk: decode N tokens per device program (device-side EOS
        early exit) instead of one jitted step per token — amortizes the
        per-dispatch cost and enables the native-s4 int4 fast path; the
        stopper is checked between chunks (chunk plays the role of
        stop_check_every). Sampling RNG chains differ from the step path,
        so stochastic outputs are not bitwise identical across modes.
        None = auto: 128 for int4-packed weights (the in-program s4
        promotion costs ~40 ms once per chunk; 128 amortizes it to ~0.3
        ms/token so served decode matches the benchmark path), per-token
        stepping otherwise. Pass 0 to force per-token stepping.

        speculative: prompt-lookup speculative decode (greedy B=1 only;
        runtime/speculative.py — measured 151 -> 309 tok/s at 7B int4).
        None = auto: on for greedy single-row requests unless VITRON_SPEC=0.
        Emitted text is the greedy continuation; near-tied argmaxes may
        break differently than the per-token path (same caveat as chunked
        decode). The stopper is applied host-side after the device EOS
        exit, so a non-EOS stop string trims text but doesn't shorten the
        device loop."""
        import os as _os

        cfg, params = self.cfg, self.params
        # stats always describe the MOST RECENT call: a non-speculative
        # request must not leave the previous request's counts visible
        self.last_spec_stats = None
        b, pad_len = plan.token_ids.shape
        if batcher is not None and b == 1:
            # serving: co-batch this request's decode with other in-flight
            # requests (runtime/batching.py ContinuousBatcher); prefill and
            # chunked decode run on the batcher's device loop
            fut = batcher.submit(plan, images=images, videos=videos,
                                 block_perm=block_perm,
                                 region_boxes=region_boxes, sampling=sampling,
                                 stopper=stopper, rng=rng)
            return [fut.result()]
        if decode_chunk is None and _has_packed_int4(params):
            decode_chunk = 128
        greedy = sampling.greedy or sampling.temperature == 0.0
        # Speculation policy (docs/PERF.md "speculation break-even"): a
        # spec step costs ~1.46x a plain step, so below ~1.5 accepted
        # tokens/forward it is a net LOSS (measured 1.04 on caption-style
        # novel text). The default is therefore a zero-device-cost PROBE:
        # decode the first chunk plain, replay prompt-lookup acceptance on
        # the emitted window host-side (exact for greedy — same history =>
        # same drafts), and only upgrade to speculative segments when the
        # measured hypothetical tokens/forward clears break-even.
        #   VITRON_SPEC=0: off · =1 (default): probe · =2: immediate
        # An explicit speculative=True keeps immediate speculation.
        explicit = speculative is True
        spec_env = _os.environ.get("VITRON_SPEC", "1")
        if speculative is None:
            speculative = greedy and b == 1 and spec_env != "0"
        speculative = speculative and greedy and b == 1
        probe = speculative and not explicit and spec_env != "2"
        max_len = max_cache_len or (pad_len + sampling.max_new_tokens)
        if speculative:
            # the verification window writes up to spec_k past the frontier
            max_len += spec_k + 1
        cache = llama.KVCache.create(cfg.llm, b, max_len=max_len)
        if self.cache_sharding is not None:
            cache = jax.device_put(cache, self.cache_sharding)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        kwargs: Dict[str, Any] = {}
        if plan.region_blocks is not None and len(plan.region_blocks) and region_boxes is not None:
            kwargs["region_boxes"] = jnp.asarray(region_boxes, jnp.float32)
            kwargs["region_block_idx"] = jnp.asarray(plan.region_blocks)
        if block_perm is not None:
            kwargs["block_perm"] = jnp.asarray(block_perm)

        logits, cache = self._prefill(
            params,
            plan_token_ids=jnp.asarray(plan.token_ids),
            plan_media_idx=jnp.asarray(plan.media_idx),
            plan_use_media=jnp.asarray(plan.use_media),
            positions=jnp.asarray(plan.position_ids),
            attn_mask=jnp.asarray(plan.attention_mask),
            images=images,
            videos=videos,
            cache=cache,
            **kwargs,
        )
        # next-token logits live at each row's last REAL position
        last = jnp.asarray(plan.seq_lens - 1)
        next_logits = jnp.take_along_axis(
            logits, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        rng, k = jax.random.split(rng)
        token = sample_token(k, next_logits, sampling.temperature,
                             sampling.top_p, sampling.greedy)[:, None]

        seq_lens = np.asarray(plan.seq_lens).copy()
        out_tokens: List[List[int]] = [[] for _ in range(b)]
        done = np.zeros(b, bool)
        pos = jnp.asarray(seq_lens)[:, None]

        if probe:
            return [self._probe_generate(
                params, plan, token, pos, cache, rng, sampling, stopper,
                decode_chunk or 128, spec_k, spec_ngram)]

        if speculative and stopper is None:
            spec_fn = self._get_spec_fn(sampling.max_new_tokens, spec_k,
                                        spec_ngram, sampling.eos_ids)
            toks, out_n, steps = spec_fn(
                params, token[0, 0], cache,
                jnp.asarray(plan.token_ids[0], jnp.int32),
                jnp.asarray(plan.seq_lens[0], jnp.int32))
            toks_host = np.asarray(toks)
            self.last_spec_stats = {"emitted": int(out_n),
                                    "forwards": int(steps) + 1}  # +prefill
            row: List[int] = []
            for t in toks_host:
                if t < 0:
                    break
                row.append(int(t))
                if int(t) in sampling.eos_ids:
                    break
            return [row]

        if speculative:
            # stopper present: run the loop in segments with a host-side
            # keyword-stop check between them (a stop string then costs at
            # most one segment of overshoot instead of max_new_tokens).
            # ADAPTIVE: a speculation step costs 1.46x a plain step
            # (docs/PERF.md), so below ~1.5 accepted tokens/forward
            # speculation is a net loss — measured 1.04 on caption-style
            # novel text vs 1.5+ on protocol/quoting text (bench
            # spec_tpf_* extras). After each segment the cumulative
            # acceptance decides whether to keep speculating or finish
            # with plain chunked decode on the same cache.
            seg = min(64, sampling.max_new_tokens)
            init_fn, _ = self._get_spec_seg_fns(
                sampling.max_new_tokens, spec_k, spec_ngram,
                sampling.eos_ids, seg)
            state = init_fn(token[0, 0], cache,
                            jnp.asarray(plan.token_ids[0], jnp.int32),
                            jnp.asarray(plan.seq_lens[0], jnp.int32))
            row = [int(token[0, 0])]
            return [self._run_spec_segments(
                params, state, row, rng, sampling, stopper,
                decode_chunk or 128, spec_k, spec_ngram)]

        if decode_chunk:
            return self._generate_chunked(
                token, pos, cache, out_tokens, done, rng, sampling,
                stopper, decode_chunk)

        for step in range(sampling.max_new_tokens):
            tok_host = np.asarray(token[:, 0])
            for i in range(b):
                if not done[i]:
                    out_tokens[i].append(int(tok_host[i]))
                    if int(tok_host[i]) in sampling.eos_ids:
                        done[i] = True
            if done.all():
                break
            if stopper is not None and (step + 1) % stop_check_every == 0:
                for i in range(b):
                    if not done[i] and stopper.should_stop(out_tokens[i]):
                        done[i] = True
                if done.all():
                    break
            if step == sampling.max_new_tokens - 1:
                break
            rng, k = jax.random.split(rng)
            token, cache = self._decode(
                params, token, pos, cache, k,
                sampling.temperature, sampling.top_p, sampling.greedy)
            pos = pos + 1
        return out_tokens

    def _generate_chunked(self, token, pos, cache, out_tokens, done, rng,
                          sampling: SamplingConfig, stopper, chunk: int,
                          record_first: bool = True):
        """record_first=False resumes a partially-decoded row: `token` is
        the last ALREADY-EMITTED token (decode input only) and the budget
        counts the tokens already in out_tokens (the adaptive-speculation
        fallback path)."""
        b = len(out_tokens)
        if record_first:
            # record the prefill-sampled first token (host, same as step path)
            tok_host = np.asarray(token[:, 0])
            for i in range(b):
                out_tokens[i].append(int(tok_host[i]))
                if int(tok_host[i]) in sampling.eos_ids:
                    done[i] = True
                elif stopper is not None and stopper.should_stop(out_tokens[i]):
                    done[i] = True
            produced = 1
        else:
            produced = max(len(row) for row in out_tokens)
        done_dev = jnp.asarray(done)
        chunk_fn = self._get_chunk_fn(chunk, sampling.temperature,
                                      sampling.top_p, sampling.greedy,
                                      sampling.eos_ids)
        while produced < sampling.max_new_tokens and not done.all():
            rng, k = jax.random.split(rng)
            limit = jnp.int32(sampling.max_new_tokens - produced)
            token, pos, cache, done_dev, buf, n = chunk_fn(
                self.params, token, pos, cache, done_dev, k, limit)
            buf_host = np.asarray(buf)
            n = int(n)
            for i in range(b):
                for j in range(n):
                    t = int(buf_host[i, j])
                    if t < 0 or done[i]:
                        break
                    out_tokens[i].append(t)
                    if t in sampling.eos_ids:
                        done[i] = True
                    # per-position stop check == per-step semantics (the
                    # keyword match is a tail window, so it must be tested
                    # at every prefix, not just the chunk boundary)
                    elif stopper is not None and stopper.should_stop(out_tokens[i]):
                        done[i] = True
            produced += n
            if stopper is not None:
                done_dev = jnp.asarray(done) | done_dev
        return out_tokens


def generate_scan(params, cfg: vitron_model.VitronConfig, plan_arrays,
                  n_new: int, rng: jax.Array, images=None, videos=None,
                  temperature: float = 0.0, top_p: float = 1.0,
                  max_cache_len: Optional[int] = None):
    """Fully-compiled fixed-length generation (benchmark path).

    plan_arrays: (token_ids, media_idx, use_media, positions, attn_mask,
    seq_lens) device arrays. Returns [B, n_new] token ids.
    """
    token_ids, media_idx, use_media, positions, attn_mask, seq_lens = plan_arrays
    # int4 weights: expand packed nibbles to native s4 once for the whole
    # generation (XLA's s4 dequant rides the dot's memory pipeline; the
    # Pallas unpack kernel used by the step-wise path is VPU-bound)
    from vitron_tpu.kernels.quantization import promote_int4

    params = promote_int4(params)
    b, pad_len = token_ids.shape
    max_len = max_cache_len or (pad_len + n_new)
    cache = llama.KVCache.create(cfg.llm, b, max_len=max_len)
    logits, cache = vitron_model.forward(
        params, cfg, token_ids, media_idx, use_media, positions, attn_mask,
        images=images, videos=videos, cache=cache)
    last = (seq_lens - 1).astype(jnp.int32)
    next_logits = jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0]
    rng, k = jax.random.split(rng)
    token = sample_token(k, next_logits, temperature, top_p, temperature == 0.0)[:, None]

    def step(carry, k):
        token, pos, cache = carry
        logits, cache = vitron_model.decode_step(params, cfg, token, pos, cache)
        nxt = sample_token(k, logits[:, -1], temperature, top_p, temperature == 0.0)[:, None]
        return (nxt, pos + 1, cache), token[:, 0]

    pos = seq_lens.astype(jnp.int32)[:, None]
    keys = jax.random.split(rng, n_new)
    (_, _, cache), toks = jax.lax.scan(step, (token, pos, cache), keys)
    return toks.T  # [B, n_new]
