"""Paged KV cache: block-pooled KV storage for multi-request serving.

New serving surface (SURVEY §7 kernel list: "paged/blocked KV cache ops");
the reference has no serving stack at all (one Gradio queue, HF generate
reallocating its cache per step). Design:

- one global block pool per layer: k/v [L, num_blocks, block_size, KV, D];
- each sequence owns a host-managed list of block ids (the block table);
  sequences grow by appending blocks, finish by returning them to the free
  list — no compaction, no per-request preallocation of max_len;
- decode attention gathers each sequence's blocks with one `jnp.take`
  (XLA gather) and masks by true length: batch of ragged sequences, one
  compiled program for a (batch, max_blocks) bucket.

Everything device-side is static-shape; raggedness lives in the int32 block
tables + lengths.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.llm.llama import LlamaConfig, apply_rope, rms_norm, rope_cos_sin
from vitron_tpu.kernels.quantization import matmul_maybe_quantized as _mm


@dataclasses.dataclass
class PagedPool:
    """Device block pool + host allocator."""

    k: jax.Array          # [L, num_blocks, block_size, KV, D]
    v: jax.Array
    block_size: int
    free: List[int]

    @staticmethod
    def create(cfg: LlamaConfig, num_blocks: int, block_size: int = 16) -> "PagedPool":
        shape = (cfg.num_layers, num_blocks, block_size,
                 cfg.num_kv_heads, cfg.head_dim)
        return PagedPool(
            k=jnp.zeros(shape, cfg.compute_dtype),
            v=jnp.zeros(shape, cfg.compute_dtype),
            block_size=block_size,
            free=list(range(num_blocks - 1, -1, -1)),
        )

    def alloc(self) -> int:
        if not self.free:
            raise RuntimeError("paged KV pool exhausted")
        return self.free.pop()

    def release(self, blocks: List[int]) -> None:
        self.free.extend(blocks)


@dataclasses.dataclass
class PagedSequence:
    """Host bookkeeping for one request."""

    blocks: List[int]
    length: int = 0

    def ensure_capacity(self, pool: PagedPool, new_tokens: int) -> None:
        need = self.length + new_tokens
        while len(self.blocks) * pool.block_size < need:
            self.blocks.append(pool.alloc())


def write_tokens(pool: PagedPool, seq: PagedSequence,
                 k_new: jax.Array, v_new: jax.Array) -> PagedPool:
    """Append [L, S, KV, D] keys/values to a sequence's blocks (general
    unaligned path: one device scatter per touched block; PagedServer uses
    the single-scatter fast paths below instead)."""
    s = k_new.shape[1]
    seq.ensure_capacity(pool, s)
    bs = pool.block_size
    pos = seq.length
    k_pool, v_pool = pool.k, pool.v
    off = 0
    while off < s:
        blk_idx = (pos + off) // bs
        blk_off = (pos + off) % bs
        take = min(bs - blk_off, s - off)
        blk = seq.blocks[blk_idx]
        k_pool = jax.lax.dynamic_update_slice(
            k_pool, k_new[:, off:off + take][:, None],
            (0, blk, blk_off, 0, 0))
        v_pool = jax.lax.dynamic_update_slice(
            v_pool, v_new[:, off:off + take][:, None],
            (0, blk, blk_off, 0, 0))
        off += take
    seq.length += s
    return PagedPool(k=k_pool, v=v_pool, block_size=bs, free=pool.free)


def gather_kv(pool: PagedPool, table: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """table: [B, max_blocks] int32 (pad with 0) ->
    k/v [L, B, max_blocks*block_size, KV, D]."""
    k = jnp.take(pool.k, table, axis=1)  # [L, B, MB, bs, KV, D]
    v = jnp.take(pool.v, table, axis=1)
    l, b, mb, bs, kv, d = k.shape
    return (k.reshape(l, b, mb * bs, kv, d), v.reshape(l, b, mb * bs, kv, d))


def paged_decode_step(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    token_embeds: jax.Array,      # [B, 1, H]
    positions: jax.Array,         # [B, 1]
    pool: PagedPool,
    table: jax.Array,             # [B, max_blocks]
    lengths: jax.Array,           # [B] (lengths INCLUDING the new token)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step over a ragged batch. The new token's K/V are returned
    per layer for the caller to scatter with write_tokens (keeping this
    function pure). Returns (logits [B, vocab], new_k, new_v [L, B, KV, D])."""
    k_all, v_all = gather_kv(pool, table)
    return decode_step_gathered(params, cfg, token_embeds, positions,
                                k_all, v_all, lengths)


def decode_step_gathered(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    token_embeds: jax.Array,      # [B, 1, H]
    positions: jax.Array,         # [B, 1]
    k_all: jax.Array,             # [L, B, T, KV, D] gathered history
    v_all: jax.Array,
    lengths: jax.Array,           # [B] (lengths INCLUDING the new token)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode step on PRE-GATHERED per-sequence KV. step_n gathers the block
    table once per n-token chunk and carries the dense view through its scan
    (the per-step gather re-read the whole history at 3x the mandatory
    traffic, docs/PERF.md 'Interactive serving')."""
    b = token_embeds.shape[0]
    h = cfg.hidden_size
    x = token_embeds.astype(cfg.compute_dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    scale = 1.0 / (cfg.head_dim ** 0.5)
    t = k_all.shape[2]
    key_pos = jnp.arange(t)[None, :]
    valid = key_pos < (lengths[:, None] - 1)   # existing tokens only

    def layer(x, inputs):
        lp, layer_k, layer_v = inputs
        xn = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = _mm(xn, lp["wq"]).reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k_new = _mm(xn, lp["wk"]).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v_new = _mm(xn, lp["wv"]).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k_new = apply_rope(k_new, cos, sin)
        # attend: gathered history (masked) + the new token itself
        kv_heads = cfg.num_kv_heads
        groups = cfg.num_heads // kv_heads
        qg = q.reshape(b, 1, kv_heads, groups, cfg.head_dim)
        hist = jnp.einsum("bskgd,btkd->bkgst", qg, layer_k.astype(q.dtype))
        hist = hist.astype(jnp.float32) * scale
        hist = jnp.where(valid[:, None, None, None, :], hist,
                         jnp.finfo(jnp.float32).min)
        self_logit = jnp.einsum("bskgd,bskd->bkgs", qg, k_new.astype(q.dtype))
        self_logit = self_logit.astype(jnp.float32)[..., None] * scale
        logits = jnp.concatenate([hist, self_logit], axis=-1)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        p_hist, p_self = probs[..., :t], probs[..., t:]
        out = jnp.einsum("bkgst,btkd->bskgd", p_hist, layer_v.astype(q.dtype))
        out = out + jnp.einsum("bkgs,bskd->bskgd", p_self[..., 0], v_new)
        att = out.reshape(b, 1, h)
        x = x + _mm(att, lp["wo"])
        xn = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mm(jax.nn.silu(_mm(xn, lp["gate"])) * _mm(xn, lp["up"]), lp["down"])
        return x, (k_new[:, 0], v_new[:, 0])

    x, (k_news, v_news) = jax.lax.scan(
        layer, x, (params["layers"], k_all, v_all))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    # _mm so the int4/int8 lm_head (quantize_llama head=True, the serving
    # default since loader.py quantizes it) works here like in llama.py:327
    logits = _mm(x[:, 0], params["lm_head"]).astype(jnp.float32)
    return logits, k_news, v_news


def sample_token_batched(key: jax.Array, logits: jax.Array,
                         temps: jax.Array, top_ps: jax.Array,
                         greedy: jax.Array) -> jax.Array:
    """Per-row sampling for co-batched decode: logits [B, V] with per-row
    temperature/top_p/greedy -> [B] int32. Rows with greedy=True (or
    temperature <= 0) take argmax; others nucleus-sample — one program
    serves a mixed batch of greedy and sampled requests."""
    greedy = greedy | (temps <= 0.0)
    safe_t = jnp.where(greedy, 1.0, temps)
    scaled = (logits / safe_t[:, None].astype(logits.dtype))
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep top-1)
    cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    masked = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(greedy, jnp.argmax(logits, axis=-1),
                     sampled).astype(jnp.int32)


class PagedServer:
    """Minimal continuous-batching loop: sequences join/leave between steps;
    each step decodes all active sequences in one program."""

    def __init__(self, params, cfg: LlamaConfig, num_blocks: int = 256,
                 block_size: int = 16, max_blocks_per_seq: int = 32):
        self.params = params
        self.cfg = cfg
        self.pool = PagedPool.create(cfg, num_blocks, block_size)
        self.max_blocks = max_blocks_per_seq
        self.seqs: Dict[int, PagedSequence] = {}
        self.last_token: Dict[int, int] = {}
        self._next_id = 0
        self._step = jax.jit(
            lambda params, emb, pos, k, v, table, lengths: paged_decode_step(
                params, cfg, emb, pos,
                PagedPool(k=k, v=v, block_size=block_size, free=[]),
                table, lengths))
        # Single-scatter cache writes (the block-loop in write_tokens costs
        # one full-pool copy per 16-token block when unjitted). Buffers are
        # donated so the pool is updated in place on TPU.
        self._scatter_blocks = jax.jit(
            lambda kp, vp, kn, vn, blocks: (kp.at[:, blocks].set(kn),
                                            vp.at[:, blocks].set(vn)),
            donate_argnums=(0, 1))
        self._scatter_token = jax.jit(
            lambda kp, vp, kn, vn, blocks, offs: (
                kp.at[:, blocks, offs].set(kn),
                vp.at[:, blocks, offs].set(vn)),
            donate_argnums=(0, 1))
        from vitron_tpu.runtime.telemetry import ProgramCache
        # one program per (chunk, batch, max_blocks) bucket; bounded + LRU
        # so shape churn in a long-running server cannot accumulate
        # executables (telemetry surfaces in /stats)
        self._chunk_fns = ProgramCache("paged-server-chunk", max_entries=16)

    def add_request(self, prompt_ids: List[int],
                    chunk: Optional[int] = None) -> int:
        """Prefill a new sequence with ONE dense-cache forward (padded to a
        `chunk` bucket for compile reuse), then copy its K/V into pool
        blocks — a request costs one prefill program + one scatter instead
        of len(prompt) decode steps."""
        import math

        from vitron_tpu.models.llm import llama as llama_mod

        sid = self._next_id
        self._next_id += 1
        seq = PagedSequence(blocks=[])
        self.seqs[sid] = seq
        n = len(prompt_ids) - 1  # the last prompt token decodes next step
        self.last_token[sid] = prompt_ids[-1]
        if n == 0:
            return sid
        bucket = chunk or n
        # round up to a whole number of blocks (>= n) so the dense K/V can be
        # reshaped straight into block rows
        bucket = self.pool.block_size * max(
            1, math.ceil(max(bucket, n) / self.pool.block_size))
        ids = jnp.zeros((1, bucket), jnp.int32).at[0, :n].set(
            jnp.asarray(prompt_ids[:n]))
        mask = jnp.zeros((1, bucket), bool).at[0, :n].set(True)
        pos = jnp.broadcast_to(jnp.arange(bucket), (1, bucket))
        cache = llama_mod.KVCache.create(self.cfg, 1, max_len=bucket)
        _, cache = llama_mod.forward_tokens(
            self.params, self.cfg, ids, positions=pos, attn_mask=mask,
            cache=cache)
        self._import_cache(sid, cache.k, cache.v, n)
        return sid

    def add_from_cache(self, cache_k: jax.Array, cache_v: jax.Array,
                       length: int, last_token: int) -> int:
        """Register a sequence whose prefill ran OUTSIDE the server (e.g. the
        multimodal spliced prefill in runtime/batching.py): copy the dense
        cache's first `length` slots into pool blocks. cache_k/v:
        [L, 1, T, KV, D] with real tokens right-padded at slots
        [0, length); `last_token` is the token the next decode step feeds
        (the one sampled from the prefill logits)."""
        sid = self._next_id
        self._next_id += 1
        self.seqs[sid] = PagedSequence(blocks=[])
        self.last_token[sid] = last_token
        if length > 0:
            self._import_cache(sid, cache_k, cache_v, length)
        return sid

    def _import_cache(self, sid: int, cache_k, cache_v, n: int) -> None:
        # scatter the dense K/V into pool blocks: prefill starts block-aligned
        # at 0, so the whole prompt lands in ONE scatter (padded tail rows in
        # the final block are dead weight masked out by `lengths` at read)
        seq = self.seqs[sid]
        bs = self.pool.block_size
        seq.ensure_capacity(self.pool, n)
        nb = len(seq.blocks)
        l, _, _, kv, d = cache_k.shape
        k_blk = cache_k[:, 0, :nb * bs].reshape(l, nb, bs, kv, d)
        v_blk = cache_v[:, 0, :nb * bs].reshape(l, nb, bs, kv, d)
        k_pool, v_pool = self._scatter_blocks(
            self.pool.k, self.pool.v, k_blk, v_blk, jnp.asarray(seq.blocks))
        self.pool = PagedPool(k=k_pool, v=v_pool, block_size=bs,
                              free=self.pool.free)
        seq.length = n

    def step(self, only: Optional[Dict[int, Any]] = None) -> Dict[int, int]:
        """One decode step for all (or selected) active sequences; returns
        {seq_id: argmax token}."""
        ids = sorted(only if only is not None else self.seqs)
        if not ids:
            return {}
        b = len(ids)
        bs = self.pool.block_size
        emb = jnp.take(self.params["embed"],
                       jnp.asarray([self.last_token[i] for i in ids]),
                       axis=0)[:, None]
        pos = jnp.asarray([[self.seqs[i].length] for i in ids])
        for i in ids:
            self.seqs[i].ensure_capacity(self.pool, 1)
        # Table width is a doubling bucket sized to the longest active
        # sequence (never truncate: a dropped block would silently corrupt
        # attention while new tokens keep scattering into it).
        need = max(len(self.seqs[i].blocks) for i in ids)
        while self.max_blocks < need:
            self.max_blocks *= 2
        table = np.zeros((b, self.max_blocks), np.int32)
        wr_blocks = np.zeros((b,), np.int32)
        wr_offs = np.zeros((b,), np.int32)
        for row, i in enumerate(ids):
            blocks = self.seqs[i].blocks
            table[row, : len(blocks)] = blocks
            length = self.seqs[i].length
            wr_blocks[row] = self.seqs[i].blocks[length // bs]
            wr_offs[row] = length % bs
        lengths = jnp.asarray([self.seqs[i].length + 1 for i in ids])
        logits, k_new, v_new = self._step(
            self.params, emb, pos, self.pool.k, self.pool.v,
            jnp.asarray(table), lengths)
        # one batched scatter writes every sequence's new token (seqs own
        # disjoint blocks, so the (block, offset) pairs never collide)
        k_pool, v_pool = self._scatter_token(
            self.pool.k, self.pool.v, k_new, v_new,
            jnp.asarray(wr_blocks), jnp.asarray(wr_offs))
        self.pool = PagedPool(k=k_pool, v=v_pool, block_size=bs,
                              free=self.pool.free)
        out = {}
        next_tokens = np.asarray(jnp.argmax(logits, axis=-1))
        for row, i in enumerate(ids):
            self.seqs[i].length += 1
            out[i] = int(next_tokens[row])
            self.last_token[i] = out[i]
        return out

    def _get_chunk_fn(self, n: int, b: int, sampled: bool):
        """Jitted n-step decode for a fixed active-batch size: one program
        promotes int4 weights to native s4 once (~40 ms for 7B, amortized
        over n tokens — the same fast path as generate_scan, see
        kernels/quantization.py) and scans n paged decode steps, scattering
        each new token's K/V through the block table on device. With
        sampled=True the program takes per-row (temps, top_ps, greedy) plus
        an rng key, so one batch mixes greedy and nucleus-sampled rows."""
        key = (n, b, self.max_blocks, sampled)
        cached = self._chunk_fns.lookup(key)
        if cached is None:
            cfg = self.cfg
            bs = self.pool.block_size

            def _chunk(params, k_pool, v_pool, table, lengths, last_token,
                       temps, top_ps, greedy, rng):
                from vitron_tpu.kernels.quantization import promote_int4

                params = promote_int4(params)
                # gather the ragged histories ONCE for the whole chunk; the
                # scan carries the dense view (same in-place update pattern
                # as the benchmark scan path) and mirrors each new token
                # into the pool so the block tables stay authoritative
                pool0 = PagedPool(k=k_pool, v=v_pool, block_size=bs, free=[])
                k_all, v_all = gather_kv(pool0, table)
                row = jnp.arange(b)
                keys = jax.random.split(rng, n)

                def body(carry, step_key):
                    k_pool, v_pool, k_all, v_all, lengths, token = carry
                    emb = jnp.take(params["embed"], token, axis=0)[:, None]
                    pos = lengths[:, None]
                    logits, k_new, v_new = decode_step_gathered(
                        params, cfg, emb, pos, k_all, v_all, lengths + 1)
                    # dense-view append (attention input for later steps)
                    k_all = k_all.at[:, row, lengths].set(k_new)
                    v_all = v_all.at[:, row, lengths].set(v_new)
                    # pool mirror (persistence across chunks)
                    wr_blocks = table[row, lengths // bs]
                    wr_offs = lengths % bs
                    k_pool = k_pool.at[:, wr_blocks, wr_offs].set(k_new)
                    v_pool = v_pool.at[:, wr_blocks, wr_offs].set(v_new)
                    if sampled:
                        nxt = sample_token_batched(step_key, logits, temps,
                                                   top_ps, greedy)
                    else:
                        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (k_pool, v_pool, k_all, v_all, lengths + 1, nxt), nxt

                (k_pool, v_pool, k_all, v_all, lengths, token), toks = \
                    jax.lax.scan(
                        body, (k_pool, v_pool, k_all, v_all, lengths,
                               last_token), keys)
                return k_pool, v_pool, lengths, token, toks.T  # [B, n]

            cached = self._chunk_fns.store(
                key, jax.jit(_chunk, donate_argnums=(1, 2)))
        return cached

    def step_n(self, n: int, sampling=None) -> Dict[int, List[int]]:
        """Decode n tokens for every active sequence in ONE device program
        (the continuous-batching granularity becomes n-token slots;
        sequences join/leave between calls). Returns {seq_id: [tokens]}.

        sampling: None for greedy-all (argmax), or a dict
        {sid: (temperature, top_p, greedy)} plus key "rng" mapping to a
        jax PRNG key — rows sample independently per their own params.
        Requests sharing a chunk also share the per-step keys, so a
        sampled request's token stream depends on which step index it
        co-batched at (not bitwise-reproducible across batch schedules)."""
        ids = sorted(self.seqs)
        if not ids or n <= 0:
            return {}
        b = len(ids)
        bs = self.pool.block_size
        for i in ids:
            self.seqs[i].ensure_capacity(self.pool, n)
        need = max(len(self.seqs[i].blocks) for i in ids)
        while self.max_blocks < need:
            self.max_blocks *= 2
        table = np.zeros((b, self.max_blocks), np.int32)
        for row, i in enumerate(ids):
            table[row, : len(self.seqs[i].blocks)] = self.seqs[i].blocks
        lengths = jnp.asarray([self.seqs[i].length for i in ids], jnp.int32)
        last = jnp.asarray([self.last_token[i] for i in ids], jnp.int32)
        sampled = sampling is not None
        if sampled:
            temps = jnp.asarray([sampling[i][0] for i in ids], jnp.float32)
            top_ps = jnp.asarray([sampling[i][1] for i in ids], jnp.float32)
            greedy = jnp.asarray([sampling[i][2] for i in ids], bool)
            rng = sampling["rng"]
        else:
            temps = top_ps = jnp.zeros((b,), jnp.float32)
            greedy = jnp.ones((b,), bool)
            rng = jax.random.PRNGKey(0)
        fn = self._get_chunk_fn(n, b, sampled)
        k_pool, v_pool, _, _, toks = fn(
            self.params, self.pool.k, self.pool.v, jnp.asarray(table),
            lengths, last, temps, top_ps, greedy, rng)
        self.pool = PagedPool(k=k_pool, v=v_pool, block_size=bs,
                              free=self.pool.free)
        toks_host = np.asarray(toks)
        out = {}
        for row, i in enumerate(ids):
            self.seqs[i].length += n
            out[i] = [int(t) for t in toks_host[row]]
            self.last_token[i] = out[i][-1]
        return out

    def finish(self, sid: int) -> None:
        self.pool.release(self.seqs.pop(sid).blocks)
        self.last_token.pop(sid, None)
