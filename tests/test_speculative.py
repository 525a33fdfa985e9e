"""Prompt-lookup speculative decoding: draft lookup + greedy exactness.

The invariant under test: speculative_decode emits EXACTLY the plain
greedy continuation (generate_scan at temperature 0) — speculation may
only change how many forwards it takes, never the tokens.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.constants import IMAGE_TOKEN_INDEX
from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.engine import MediaItem, prepare_batch
from vitron_tpu.runtime.generation import generate_scan
from vitron_tpu.runtime.speculative import ngram_draft, speculative_decode


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _plan(rows, media=None, image_len=16):
    plan, images, videos, _ = prepare_batch(rows, media or [], pad_to=64,
                                            image_len=image_len)
    arrays = (jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
              jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
              jnp.asarray(plan.attention_mask), jnp.asarray(plan.seq_lens))
    return arrays, (jnp.asarray(images) if media else None)


# ---------------------------------------------------------------- draft


def test_ngram_draft_finds_most_recent_continuation():
    # (5,6) occurs at 0 with continuation [7,8,5]; the tail occurrence at 4
    # is the trivial self-match and must be excluded
    hist = jnp.asarray([5, 6, 7, 8, 5, 6, 0, 0], jnp.int32)
    d = ngram_draft(hist, jnp.int32(6), jnp.int32(6), k=3, ngram=2)
    assert d.tolist() == [7, 8, 5]


def test_ngram_draft_prefers_recent_match():
    # (3,4) at 0 -> cont 9...; (3,4) at 4 -> cont 1,2 — most recent wins
    hist = jnp.asarray([3, 4, 9, 9, 3, 4, 1, 2, 3, 4, 0, 0], jnp.int32)
    d = ngram_draft(hist, jnp.int32(10), jnp.int32(4), k=2, ngram=2)
    assert d.tolist() == [1, 2]


def test_ngram_draft_no_match_repeats_last():
    hist = jnp.asarray([1, 2, 3, 4, 0, 0], jnp.int32)
    d = ngram_draft(hist, jnp.int32(4), jnp.int32(4), k=3, ngram=2)
    assert d.tolist() == [4, 4, 4]


# ------------------------------------------------------------ exactness


@pytest.mark.parametrize("k,ngram", [(1, 2), (4, 2), (3, 3)])
def test_speculative_matches_greedy_scan(tiny_setup, k, ngram):
    cfg, params = tiny_setup
    n_new = 24
    rows = [[1, 5, 9, 7, 5, 9, 3]]
    arrays, _ = _plan(rows)
    ref = np.asarray(generate_scan(params, cfg, arrays, n_new,
                                   jax.random.PRNGKey(0), temperature=0.0))[0]
    toks, out_n, steps = speculative_decode(
        params, cfg, arrays, n_new, k=k, ngram=ngram, eos_ids=())
    toks = np.asarray(toks)
    assert int(out_n) == n_new
    assert 1 <= int(steps) <= n_new
    np.testing.assert_array_equal(toks, ref)


def test_speculative_matches_greedy_with_image(tiny_setup):
    cfg, params = tiny_setup
    n_new = 16
    rows = [[1, 5, IMAGE_TOKEN_INDEX, 7, 3]]
    media = [MediaItem("image", np.random.RandomState(0)
                       .rand(28, 28, 3).astype(np.float32))]
    arrays, images = _plan(rows, media)
    ref = np.asarray(generate_scan(params, cfg, arrays, n_new,
                                   jax.random.PRNGKey(0), temperature=0.0,
                                   images=images))[0]
    toks, out_n, _ = speculative_decode(
        params, cfg, arrays, n_new, k=4, eos_ids=(), images=images)
    np.testing.assert_array_equal(np.asarray(toks), ref)
    assert int(out_n) == n_new


def test_speculative_eos_truncates(tiny_setup):
    cfg, params = tiny_setup
    n_new = 24
    rows = [[1, 5, 9, 7, 5, 9, 3]]
    arrays, _ = _plan(rows)
    ref = np.asarray(generate_scan(params, cfg, arrays, n_new,
                                   jax.random.PRNGKey(0), temperature=0.0))[0]
    # declare the token greedy decode emits at position 5 to be "EOS"; the
    # speculative output must stop at its FIRST occurrence
    eos_tok = int(ref[5])
    first = int(np.argmax(ref == eos_tok))
    toks, out_n, _ = speculative_decode(
        params, cfg, arrays, n_new, k=4, eos_ids=(eos_tok,))
    toks = np.asarray(toks)
    assert int(out_n) == first + 1
    np.testing.assert_array_equal(toks[: first + 1], ref[: first + 1])
    assert (toks[first + 1:] == -1).all()


def test_speculative_accepts_on_repetitive_continuation(tiny_setup):
    """A prompt whose greedy continuation cycles (common for tiny random
    weights) must be accelerated: if the reference decode is periodic with
    period p <= k after warmup, prompt lookup predicts it perfectly and
    steps << n_new. Guarded: only asserted when the continuation IS cyclic."""
    cfg, params = tiny_setup
    n_new = 48
    rows = [[1, 5, 9, 7, 5, 9, 3]]
    arrays, _ = _plan(rows)
    ref = np.asarray(generate_scan(params, cfg, arrays, n_new,
                                   jax.random.PRNGKey(0), temperature=0.0))[0]
    tail = ref[n_new // 2:]
    cyclic = any((tail[:-p] == tail[p:]).all() for p in range(1, 5))
    toks, out_n, steps = speculative_decode(
        params, cfg, arrays, n_new, k=4, ngram=2, eos_ids=())
    np.testing.assert_array_equal(np.asarray(toks), ref)
    if cyclic:
        assert int(steps) < n_new // 2, (
            f"cyclic continuation but {int(steps)} forwards for {n_new} tokens")


def test_speculative_near_argmax_property(tiny_setup):
    """The durable invariant under float noise: EVERY emitted token is the
    argmax continuation of the emitted prefix, up to reduction-order
    rounding between the s=1 and s=k+1 compiled forwards (near-tied
    argmaxes may break differently — same caveat as chunked decode). A
    bookkeeping bug (wrong slot/position/rollback) shows up as gaps of
    whole logits, far above the tolerance."""
    from vitron_tpu.models.llm import llama

    cfg, params = tiny_setup
    n_new = 64
    for seed in range(4):
        rs = np.random.RandomState(seed)
        row = [1] + list(rs.randint(3, 200, 9))
        arrays, _ = _plan([row])
        toks, out_n, _ = speculative_decode(params, cfg, arrays, n_new,
                                            k=4, ngram=2, eos_ids=())
        emitted = [int(t) for t in np.asarray(toks)[: int(out_n)]]
        seq = np.asarray(row + emitted, np.int32)
        lg = np.asarray(llama.forward_tokens(
            params["llm"], cfg.llm, jnp.asarray(seq[None]),
            positions=jnp.arange(len(seq), dtype=jnp.int32)[None],
            attn_mask=jnp.ones((1, len(seq)), bool))[0][0], np.float32)
        for i in range(len(row) - 1, len(seq) - 1):
            gap = float(lg[i].max() - lg[i, seq[i + 1]])
            assert gap < 0.15, (
                f"seed {seed}: token {seq[i+1]} at {i+1} is {gap:.3f} logits "
                f"below argmax {int(lg[i].argmax())} — not a near-tie")


def test_speculative_deterministic(tiny_setup):
    cfg, params = tiny_setup
    arrays, _ = _plan([[1, 5, 9, 7, 5, 9, 3]])
    a = np.asarray(speculative_decode(params, cfg, arrays, 32, k=4,
                                      eos_ids=())[0])
    b = np.asarray(speculative_decode(params, cfg, arrays, 32, k=4,
                                      eos_ids=())[0])
    np.testing.assert_array_equal(a, b)


def test_generator_speculative_path(tiny_setup):
    """Generator.generate(speculative=True) returns the same greedy tokens
    as the per-token step path for this pinned prompt and records stats."""
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, images, videos, _ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [],
                                            pad_to=64, image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=16, eos_ids=())
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=0)
    out = gen.generate(plan, sampling=s, speculative=True)
    assert out == ref
    assert gen.last_spec_stats is not None
    assert gen.last_spec_stats["emitted"] == 16
    assert 1 <= gen.last_spec_stats["forwards"] <= 17


class _IdTok:
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


def test_segmented_speculation_with_stopper_matches_plain(tiny_setup):
    """With a keyword stopper, the Generator runs the loop in SEGMENTS
    (host stop check between; runtime/speculative.py speculative_segment)
    and must still emit exactly the plain greedy continuation."""
    from vitron_tpu.mm.tokenization import KeywordStopper
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=24, eos_ids=())
    stopper = KeywordStopper(["no-such-stop-string"], _IdTok(), prompt_len=0)
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=0)
    out = gen.generate(plan, sampling=s, speculative=True, stopper=stopper)
    assert out == ref
    assert gen.last_spec_stats["fell_back"] in (False, True)


def test_adaptive_fallback_resumes_exactly(tiny_setup, monkeypatch):
    """Force the acceptance threshold impossibly high: speculation must
    fall back to plain chunked decode mid-generation and the combined
    output must still equal the plain greedy continuation."""
    from vitron_tpu.mm.tokenization import KeywordStopper
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    monkeypatch.setenv("VITRON_SPEC_TPF_MIN", "1000")
    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=48, eos_ids=())
    stopper = KeywordStopper(["no-such-stop-string"], _IdTok(), prompt_len=0)
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=0)
    out = gen.generate(plan, sampling=s, speculative=True, stopper=stopper,
                       decode_chunk=8)
    assert gen.last_spec_stats["fell_back"] is True
    assert out == ref


def test_hypothetical_tpf_repetitive_vs_novel():
    """The host-side probe replay scores a cyclic continuation high and a
    novel (non-repeating) one at ~1 token/forward."""
    from vitron_tpu.runtime.speculative import hypothetical_tpf

    prompt = np.asarray([1, 5, 9, 7, 0, 0, 0, 0], np.int32)
    cyclic = [3, 4, 6, 3, 4, 6, 3, 4, 6, 3, 4, 6, 3, 4, 6, 3]
    novel = [11, 23, 37, 41, 53, 67, 71, 83, 97, 13, 17, 19, 29, 31, 43, 47]
    hi = hypothetical_tpf(prompt, 4, cyclic, k=4, ngram=2)
    lo = hypothetical_tpf(prompt, 4, novel, k=4, ngram=2)
    assert hi > 2.0, hi
    assert lo <= 1.1, lo


def test_probe_policy_stays_plain(tiny_setup, monkeypatch):
    """Default policy (speculative=None): the probe decodes the first chunk
    plain; with the upgrade threshold forced unreachable the request stays
    plain end-to-end — identical tokens, zero speculative device steps."""
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    monkeypatch.setenv("VITRON_SPEC", "1")
    monkeypatch.setenv("VITRON_SPEC_TPF_MIN", "1000")
    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=48, eos_ids=())
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=16)
    out = gen.generate(plan, sampling=s, decode_chunk=16)
    assert out == ref
    assert gen.last_spec_stats["mode"] == "probe_plain"
    assert gen.last_spec_stats["fell_back"] is False
    assert "probe_tpf" in gen.last_spec_stats


def test_probe_policy_upgrade_matches_plain(tiny_setup, monkeypatch):
    """Force the threshold to 0 so the probe ALWAYS upgrades mid-stream:
    the plain-chunk -> speculative-segment cache/history handoff
    (spec_resume_state) must preserve the exact greedy continuation."""
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    monkeypatch.setenv("VITRON_SPEC", "1")
    monkeypatch.setenv("VITRON_SPEC_TPF_MIN", "0")
    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=48, eos_ids=())
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=16)
    out = gen.generate(plan, sampling=s, decode_chunk=16)
    assert out == ref
    assert gen.last_spec_stats["mode"] == "probe_spec"


def test_probe_policy_upgrade_with_stopper(tiny_setup, monkeypatch):
    """Probe upgrade composes with the keyword stopper (host check between
    segments) and still matches the plain continuation."""
    from vitron_tpu.mm.tokenization import KeywordStopper
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    monkeypatch.setenv("VITRON_SPEC", "1")
    monkeypatch.setenv("VITRON_SPEC_TPF_MIN", "0")
    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=40, eos_ids=())
    stopper = KeywordStopper(["no-such-stop-string"], _IdTok(), prompt_len=0)
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=16)
    out = gen.generate(plan, sampling=s, stopper=stopper, decode_chunk=16)
    assert out == ref


def test_spec_env_modes(tiny_setup, monkeypatch):
    """VITRON_SPEC=0 disables; =2 keeps the r4 immediate-speculation auto
    (no probe chunk). Both must emit the plain greedy continuation."""
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=16, eos_ids=())
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=0)

    monkeypatch.setenv("VITRON_SPEC", "0")
    out0 = gen.generate(plan, sampling=s, decode_chunk=16)
    assert out0 == ref
    assert gen.last_spec_stats is None

    monkeypatch.setenv("VITRON_SPEC", "2")
    out2 = gen.generate(plan, sampling=s, decode_chunk=16)
    assert out2 == ref
    assert gen.last_spec_stats is not None
    assert "mode" not in gen.last_spec_stats  # immediate path, no probe


def test_speculative_rejects_batch(tiny_setup):
    cfg, params = tiny_setup
    rows = [[1, 5, 3], [1, 7, 3]]
    arrays, _ = _plan(rows)
    with pytest.raises(ValueError, match="single-stream"):
        speculative_decode(params, cfg, arrays, 8)


def test_zero_emission_segment_falls_back_plain(tiny_setup, monkeypatch):
    """Defensive r5 hardening: a segment that emits 0 tokens WITHOUT the
    device done flag (observed once as a long-suite CPU flake) must not
    truncate the generation — the Generator finishes the budget as plain
    chunked decode on the exact cache frontier."""
    from vitron_tpu.runtime.generation import Generator, SamplingConfig

    monkeypatch.setenv("VITRON_SPEC_TPF_MIN", "0")
    cfg, params = tiny_setup
    gen = Generator(params, cfg)
    plan, *_ = prepare_batch([[1, 5, 9, 7, 5, 9, 3]], [], pad_to=64,
                             image_len=16)
    s = SamplingConfig(greedy=True, max_new_tokens=40, eos_ids=())
    ref = gen.generate(plan, sampling=s, speculative=False, decode_chunk=16)

    real = gen._get_spec_seg_fns

    calls = {"n": 0}

    def patched(*a, **kw):
        init_fn, seg_fn = real(*a, **kw)

        def bad_seg(params, state, limit):
            calls["n"] += 1
            if calls["n"] == 1:  # poison the FIRST segment
                # fabricate the zero-emission return WITHOUT calling the
                # real (donating) seg_fn, so `state` stays alive
                import jax.numpy as _jnp

                seg = 40  # min(64, max_new_tokens)
                return (_jnp.full((seg,), -1, _jnp.int32), _jnp.int32(0),
                        _jnp.int32(0), state)
            return seg_fn(params, state, limit)

        return init_fn, bad_seg

    monkeypatch.setattr(gen, "_get_spec_seg_fns", patched)
    from vitron_tpu.mm.tokenization import KeywordStopper

    stopper = KeywordStopper(["no-such-stop-string"], _IdTok(), prompt_len=0)
    out = gen.generate(plan, sampling=s, speculative=True,
                       stopper=stopper, decode_chunk=16)
    assert out == ref, (out, ref)
    assert gen.last_spec_stats["fell_back"] is True
