"""Prompt-lookup speculative decoding (greedy, single-stream).

Single-token decode on this chip is HBM-bound: every step streams the
full weight set (3.3 GB int4) to produce ONE token (docs/PERF.md decode
attribution). A (k+1)-token verification forward reads the same weights
once, so verifying k drafted tokens costs almost nothing over a plain
step — each accepted draft is a nearly-free extra token.

Drafts come from *prompt lookup* (n-gram continuation): match the last
`ngram` emitted tokens against the prompt+generated history and propose
the k tokens that followed the most recent earlier occurrence. No draft
model, no extra weights — ideal for the reference's chat workloads
(reference app.py:562-571 runs HF generate at 1 token/step), where
answers quote the prompt, repeat entity names, and emit structured
protocol strings (the <SP>/[brackets] task tags of mm/protocol.py).

Verification preserves greedy argmax SEMANTICS: every emitted token is
the argmax continuation as computed by the (k+1)-wide forward. It is
not bitwise identical to the s=1 decode loop: the two compile to
different reduction orders, so a near-tied argmax (logit gap within
float rounding) can break differently — the same caveat as the chunked
decode path (runtime/generation.py). Measured on-chip at 7B int4:
151 -> 309 tok/s (k=4) / 319 tok/s (k=8) at 2.98 / 3.28 accepted
tokens per forward on a cyclic continuation; a speculation step costs
1.46x a plain step, so the break-even acceptance is ~0.5 extra tokens
per forward and anything above that is pure win.

Cache-rollback invariant (why rejected drafts need no undo): every step
writes exactly k+1 slots at `slot` and then advances `slot` by
n_emit >= 1, so the stale span [slot+n_emit, slot+k+1) is always
contained in the NEXT step's write window [slot+n_emit,
slot+n_emit+k+1) — stale K/V and `valid` flags are overwritten before
any query can attend them (llama.forward's slot-causal mask only
exposes slots <= the current query slot).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vitron_tpu.models import vitron_model
from vitron_tpu.models.llm import llama


def ngram_draft(history: jax.Array, hist_len: jax.Array, last_token: jax.Array,
                k: int, ngram: int = 2) -> jax.Array:
    """Propose k continuation tokens by n-gram lookup over the history.

    history: [T] int32 buffer of prompt + emitted tokens (garbage past
    hist_len); hist_len: scalar int32 count of real tokens; last_token:
    scalar int32, the token the continuation must follow (history's last
    real entry). Returns [k] int32 draft (arbitrary tokens when no match —
    verification rejects them, so a bad draft only costs acceptance).
    """
    t = history.shape[0]
    n_win = t - ngram + 1
    # the key is the last `ngram` real tokens (…, last_token)
    key = jax.lax.dynamic_slice(history, (jnp.maximum(hist_len - ngram, 0),),
                                (ngram,))
    idx = jnp.arange(n_win)[:, None] + jnp.arange(ngram)[None, :]
    windows = history[idx]                       # [n_win, ngram]
    starts = jnp.arange(n_win)
    match = jnp.all(windows == key[None, :], axis=1)
    # a usable match must have at least one continuation token inside the
    # real history — which also excludes the trivial self-match of the key
    # with itself at the tail (its continuation starts AT hist_len)
    usable = match & (starts + ngram < hist_len)
    best = jnp.max(jnp.where(usable, starts, -1))
    cont = jax.lax.dynamic_slice(history, (jnp.maximum(best, 0) + ngram,), (k,))
    # no match: propose last_token repeated (costs nothing; occasionally
    # right for runs of a repeated token)
    return jnp.where(best >= 0, cont, jnp.broadcast_to(last_token, (k,)))


def _first_eos_truncate(g: jax.Array, acc: jax.Array, eos: jax.Array):
    """g: [k+1] greedy tokens, acc: #accepted drafts. Returns (n_emit, done):
    emissions truncated at the first EOS among the acc+1 emittable tokens."""
    k1 = g.shape[0]
    emittable = jnp.arange(k1) <= acc
    is_eos = jnp.any(g[:, None] == eos[None, :], axis=-1) & emittable
    any_eos = jnp.any(is_eos)
    first = jnp.argmax(is_eos)            # index of first True (0 if none)
    n_emit = jnp.where(any_eos, first + 1, acc + 1).astype(jnp.int32)
    return n_emit, any_eos


def spec_init_state(tok0: jax.Array, cache: llama.KVCache,
                    prompt_ids: jax.Array, seq_len: jax.Array,
                    n_new: int, k: int,
                    eos_ids: Tuple[int, ...] = (2,)):
    """Build the resumable decode-loop state after prefill. The history
    buffer is sized for the TOTAL emission budget `n_new`; segments then
    consume it incrementally (speculative_segment)."""
    eos = jnp.asarray(list(eos_ids) or [-1], jnp.int32)
    pad_len = prompt_ids.shape[0]
    hist_size = pad_len + n_new + k + 1
    history = jnp.zeros((hist_size,), jnp.int32)
    history = jax.lax.dynamic_update_slice(
        history, prompt_ids.astype(jnp.int32), (0,))
    seq0 = seq_len.astype(jnp.int32)
    tok0 = tok0.astype(jnp.int32)
    history = jax.lax.dynamic_update_slice(history, tok0[None], (seq0,))
    tok0_eos = jnp.any(tok0 == eos)
    # (last_tok, slot, pos, ck, cv, cvalid, history, hist_len, done, steps)
    return (tok0, cache.index, seq0, cache.k, cache.v, cache.valid,
            history, seq0 + 1, tok0_eos, jnp.int32(0))


def hypothetical_tpf(prompt_row, seq_len: int, emitted, k: int = 4,
                     ngram: int = 2) -> float:
    """Host-side replay of the prompt-lookup acceptance on ALREADY-emitted
    greedy tokens — the zero-device-cost speculation probe.

    Greedy speculation emits exactly the greedy continuation, so the drafts
    it WOULD have proposed depend only on (prompt, emitted-so-far) — both
    known after a plain decode chunk. Simulating the accept loop on that
    window therefore measures the exact tokens-per-forward speculation
    would have achieved, without running a single speculative device step.
    Returns emitted-tokens-per-forward over `emitted[1:]` (tok0 comes from
    the prefill in both modes). Mirrors ngram_draft's device semantics:
    most-recent n-gram match with a usable continuation, else repeat-last.
    """
    import numpy as np

    seq = list(np.asarray(prompt_row[:seq_len]).tolist()) + [int(t) for t in emitted]
    base = seq_len + 1          # first drafted position (after tok0)
    total = len(seq)
    if total - base <= 0:
        return 0.0
    forwards = 0
    i = base
    while i < total:
        hist = seq[:i]
        key = tuple(hist[-ngram:])
        draft = None
        # most recent occurrence of `key` with continuation inside hist
        for s in range(len(hist) - ngram - 1, -1, -1):
            if tuple(hist[s:s + ngram]) == key:
                draft = hist[s + ngram:s + ngram + k]
                break
        if draft is None:
            draft = [hist[-1]] * k
        draft = (draft + [-1] * k)[:k]
        acc = 0
        while (acc < k and i + acc < total and draft[acc] == seq[i + acc]):
            acc += 1
        i += acc + 1
        forwards += 1
    return (total - base) / max(forwards, 1)


def spec_resume_state(last_tok, cache: llama.KVCache, prompt_row,
                      seq_len: int, emitted, n_new: int, k: int):
    """Build a segment-loop state from a PLAIN chunked-decode frontier (the
    probe-upgrade handoff, runtime/generation.py). `emitted` are the tokens
    produced so far (tok0 first, last one NOT yet written to the cache —
    exactly the chunked path's loop invariant, which matches the segment
    body's: inputs = [last_tok, draft...] written at cache.index."""
    import numpy as np

    pad_len = int(np.shape(prompt_row)[0])
    hist_size = pad_len + n_new + k + 1   # == spec_init_state's layout
    history = np.zeros((hist_size,), np.int32)
    history[:pad_len] = np.asarray(prompt_row, np.int32)
    n_emit = len(emitted)
    history[seq_len:seq_len + n_emit] = np.asarray(emitted, np.int32)
    return (jnp.asarray(int(last_tok), jnp.int32), cache.index,
            jnp.asarray(seq_len + n_emit - 1, jnp.int32),
            cache.k, cache.v, cache.valid,
            jnp.asarray(history), jnp.asarray(seq_len + n_emit, jnp.int32),
            jnp.asarray(False), jnp.int32(0))


def speculative_segment(
    params,
    cfg: vitron_model.VitronConfig,
    state,
    seg: int,                 # static segment emission budget
    limit: jax.Array,         # scalar int32: remaining TOTAL budget
    k: int = 4,
    ngram: int = 2,
    eos_ids: Tuple[int, ...] = (2,),
):
    """Run the speculative loop for up to min(seg, limit) emitted tokens,
    then return to the host (so keyword stoppers can be checked between
    segments instead of paying the full max_new_tokens latency, and the
    segment program is reused across requests of any budget). Returns
    (tokens [seg] with -1 past the end, n_emitted, n_forwards, state)."""
    eos = jnp.asarray(list(eos_ids) or [-1], jnp.int32)
    budget = jnp.minimum(jnp.int32(seg), limit.astype(jnp.int32))
    out = jnp.full((seg + k + 1,), -1, jnp.int32)

    def cond(carry):
        out_n, done = carry[9], carry[10]
        return (out_n < budget) & ~done

    def body(carry):
        (last_tok, slot, pos, ck, cv, cvalid, history, hist_len, out_buf,
         out_n, done, steps) = carry
        draft = ngram_draft(history, hist_len, last_tok, k, ngram)
        inputs = jnp.concatenate([last_tok[None], draft])[None]      # [1, k+1]
        pos_step = (pos + jnp.arange(k + 1, dtype=jnp.int32))[None]  # [1, k+1]
        cache_in = llama.KVCache(k=ck, v=cv, index=slot, valid=cvalid)
        logits, cache_out = vitron_model.decode_step(
            params, cfg, inputs, pos_step, cache_in)
        g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)         # [k+1]
        # accepted drafts: longest prefix where draft[i] == greedy g[i]
        acc = jnp.cumprod((draft == g[:k]).astype(jnp.int32)).sum()
        n_emit, any_eos = _first_eos_truncate(g, acc, eos)
        # cap at the remaining budget so hist/slot track the KEPT tail only
        n_emit = jnp.minimum(n_emit, budget - out_n)
        out_buf = jax.lax.dynamic_update_slice(out_buf, g, (out_n,))
        history = jax.lax.dynamic_update_slice(history, g, (hist_len,))
        last_tok = g[jnp.maximum(n_emit - 1, 0)]
        # rebuild the cache index at the ACCEPTED frontier (cache_out.index
        # advanced by k+1); stale slots get overwritten next step — see the
        # module docstring's rollback invariant
        return (last_tok, slot + n_emit, pos + n_emit,
                cache_out.k, cache_out.v, cache_out.valid,
                history, hist_len + n_emit, out_buf, out_n + n_emit,
                done | any_eos, steps + 1)

    (last_tok, slot, pos, ck, cv, cvalid, history, hist_len, done,
     steps0) = state
    init = (last_tok, slot, pos, ck, cv, cvalid, history, hist_len, out,
            jnp.int32(0), done, jnp.int32(0))
    final = jax.lax.while_loop(cond, body, init)
    out_buf, out_n, steps = final[8], final[9], final[11]
    # tokens past out_n are stale write-window garbage: mask to -1
    toks = jnp.where(jnp.arange(seg + k + 1) < out_n, out_buf, -1)[:seg]
    new_state = (final[0], final[1], final[2], final[3], final[4], final[5],
                 final[6], final[7], final[10], steps0 + steps)
    return toks, out_n, steps, new_state


def speculative_loop(
    params,
    cfg: vitron_model.VitronConfig,
    tok0: jax.Array,          # scalar int32: first (greedy) token
    cache: llama.KVCache,     # after prefill; needs >= n_new + k + 1 free slots
    prompt_ids: jax.Array,    # [pad_len] int32 spliced row (match material)
    seq_len: jax.Array,       # scalar int32: true spliced length
    n_new: int,
    k: int = 4,
    ngram: int = 2,
    eos_ids: Tuple[int, ...] = (2,),
):
    """The decode loop only (prefill done by the caller), whole budget in
    one program. Params must already be promoted/densified as the caller's
    decode path expects. Returns (tokens [n_new] with -1 past the end,
    n_emitted, n_forwards) where n_emitted INCLUDES tok0."""
    state = spec_init_state(tok0, cache, prompt_ids, seq_len, n_new, k,
                            eos_ids)
    # budget n_new - 1: tok0 is already emitted (held by the caller)
    toks, out_n, steps, _ = speculative_segment(
        params, cfg, state, n_new, jnp.int32(n_new - 1), k=k, ngram=ngram,
        eos_ids=eos_ids)
    toks = jnp.concatenate([state[0][None], toks])[:n_new]
    toks = jnp.where(jnp.arange(n_new) < out_n + 1, toks, -1)
    return toks, out_n + 1, steps


def speculative_decode(
    params,
    cfg: vitron_model.VitronConfig,
    plan_arrays,
    n_new: int,
    k: int = 4,
    ngram: int = 2,
    eos_ids: Tuple[int, ...] = (2,),
    images: Optional[jax.Array] = None,
    videos: Optional[jax.Array] = None,
    max_cache_len: Optional[int] = None,
):
    """Greedy generation with prompt-lookup speculation, fully compiled.

    plan_arrays: the generate_scan tuple (token_ids, media_idx, use_media,
    positions, attn_mask, seq_lens), batch 1. Returns (tokens [n_new],
    n_emitted, n_steps): tokens past the first EOS (and past n_emitted) are
    -1; n_steps is the number of model forwards taken, so tokens-per-forward
    (the speedup over plain 1-token decode at equal step cost) is
    n_emitted / n_steps.
    """
    token_ids, media_idx, use_media, positions, attn_mask, seq_lens = plan_arrays
    from vitron_tpu.kernels.quantization import promote_int4

    params = promote_int4(params)
    b, pad_len = token_ids.shape
    if b != 1:
        raise ValueError("speculative_decode is the single-stream path (B=1); "
                         "use PagedServer for batched serving")
    max_len = max_cache_len or (pad_len + n_new + k + 1)
    cache = llama.KVCache.create(cfg.llm, 1, max_len=max_len)
    logits, cache = vitron_model.forward(
        params, cfg, token_ids, media_idx, use_media, positions, attn_mask,
        images=images, videos=videos, cache=cache)
    last = (seq_lens - 1).astype(jnp.int32)
    next_logits = jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0]
    tok0 = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)[0]  # scalar
    return speculative_loop(params, cfg, tok0, cache, token_ids[0],
                            seq_lens[0], n_new, k=k, ngram=ngram,
                            eos_ids=eos_ids)
