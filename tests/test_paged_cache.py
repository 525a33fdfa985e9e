"""Paged KV cache: parity with the dense cache + allocator behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.llm import llama
from vitron_tpu.models.llm.paged_cache import PagedPool, PagedSequence, PagedServer, write_tokens


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_paged_matches_dense_greedy(tiny):
    """Greedy continuation through the paged server == dense-cache greedy."""
    cfg, params = tiny
    prompt = [5, 17, 3, 99, 42]

    # dense reference
    cache = llama.KVCache.create(cfg, 1, max_len=64)
    ids = jnp.asarray([prompt])
    pos = jnp.arange(len(prompt))[None]
    logits, cache = llama.forward_tokens(params, cfg, ids, positions=pos, cache=cache)
    tok = int(jnp.argmax(logits[0, -1]))
    dense = [tok]
    for i in range(5):
        l, cache = llama.forward_tokens(
            params, cfg, jnp.asarray([[tok]]),
            positions=jnp.asarray([[len(prompt) + i]]), cache=cache)
        tok = int(jnp.argmax(l[0, -1]))
        dense.append(tok)

    # paged server (block_size 4 forces multi-block tables)
    srv = PagedServer(params, cfg, num_blocks=32, block_size=4)
    sid = srv.add_request(prompt)
    paged = []
    for _ in range(6):
        paged.append(srv.step()[sid])
    assert paged == dense


def test_two_sequences_isolated(tiny):
    """Interleaved sequences decode identically to each alone."""
    cfg, params = tiny
    pa, pb = [5, 17, 3], [100, 42, 7, 9]

    def alone(prompt, n=4):
        srv = PagedServer(params, cfg, num_blocks=32, block_size=4)
        sid = srv.add_request(prompt)
        return [srv.step()[sid] for _ in range(n)]

    want_a, want_b = alone(pa), alone(pb)

    srv = PagedServer(params, cfg, num_blocks=64, block_size=4)
    sa = srv.add_request(pa)
    sb = srv.add_request(pb)
    got_a, got_b = [], []
    for _ in range(4):
        out = srv.step()
        got_a.append(out[sa])
        got_b.append(out[sb])
    assert got_a == want_a
    assert got_b == want_b


def test_blocks_recycled(tiny):
    cfg, params = tiny
    srv = PagedServer(params, cfg, num_blocks=8, block_size=4)
    free0 = len(srv.pool.free)
    sid = srv.add_request([1, 2, 3, 4, 5])
    assert len(srv.pool.free) < free0
    srv.finish(sid)
    assert len(srv.pool.free) == free0


def test_table_grows_past_max_blocks(tiny):
    """Sequences longer than max_blocks_per_seq*block_size must keep full
    attention (regression: the block table used to silently truncate)."""
    cfg, params = tiny
    prompt = [5, 17, 3, 99, 42, 8, 11, 2]
    n_steps = 12  # 8 prompt + 12 decode = 20 tokens > 2 blocks * 4

    cache = llama.KVCache.create(cfg, 1, max_len=64)
    logits, cache = llama.forward_tokens(
        params, cfg, jnp.asarray([prompt]),
        positions=jnp.arange(len(prompt))[None], cache=cache)
    tok = int(jnp.argmax(logits[0, -1]))
    dense = [tok]
    for i in range(n_steps - 1):
        l, cache = llama.forward_tokens(
            params, cfg, jnp.asarray([[tok]]),
            positions=jnp.asarray([[len(prompt) + i]]), cache=cache)
        tok = int(jnp.argmax(l[0, -1]))
        dense.append(tok)

    srv = PagedServer(params, cfg, num_blocks=32, block_size=4,
                      max_blocks_per_seq=2)
    sid = srv.add_request(prompt)
    paged = [srv.step()[sid] for _ in range(n_steps)]
    assert srv.max_blocks >= 5  # grew past the initial bucket
    assert paged == dense


def test_step_n_chunked_matches_dense(tiny):
    """step_n (one program, n scanned decode steps, in-program int4
    promotion path) must reproduce dense-cache greedy, 16/16 tokens,
    including across a block boundary and a table growth."""
    cfg, params = tiny
    prompt = [5, 17, 3, 99, 42]
    n = 16

    cache = llama.KVCache.create(cfg, 1, max_len=64)
    logits, cache = llama.forward_tokens(
        params, cfg, jnp.asarray([prompt]),
        positions=jnp.arange(len(prompt))[None], cache=cache)
    tok = int(jnp.argmax(logits[0, -1]))
    dense = [tok]
    for i in range(n - 1):
        l, cache = llama.forward_tokens(
            params, cfg, jnp.asarray([[tok]]),
            positions=jnp.asarray([[len(prompt) + i]]), cache=cache)
        tok = int(jnp.argmax(l[0, -1]))
        dense.append(tok)

    srv = PagedServer(params, cfg, num_blocks=32, block_size=4,
                      max_blocks_per_seq=2)
    sid = srv.add_request(prompt)
    first = srv.step()[sid]          # samples the prefill token
    rest = srv.step_n(n - 1)[sid]
    assert [first] + rest == dense


def test_step_n_two_sequences(tiny):
    """Chunked decode over a ragged batch stays isolated per sequence."""
    cfg, params = tiny
    pa, pb = [5, 17, 3], [100, 42, 7, 9]

    def alone(prompt, n=6):
        srv = PagedServer(params, cfg, num_blocks=32, block_size=4)
        sid = srv.add_request(prompt)
        first = srv.step()[sid]
        return [first] + srv.step_n(n - 1)[sid]

    want_a, want_b = alone(pa), alone(pb)
    srv = PagedServer(params, cfg, num_blocks=64, block_size=4)
    sa, sb = srv.add_request(pa), srv.add_request(pb)
    firsts = srv.step()
    chunk = srv.step_n(5)
    assert [firsts[sa]] + chunk[sa] == want_a
    assert [firsts[sb]] + chunk[sb] == want_b


def test_pool_exhaustion_raises(tiny):
    cfg, params = tiny
    srv = PagedServer(params, cfg, num_blocks=2, block_size=4)
    with pytest.raises(RuntimeError, match="exhausted"):
        srv.add_request(list(range(1, 20)))


def test_paged_decode_with_quantized_head(tiny):
    """The serving default quantizes lm_head too (loader.py head=True);
    the paged decode path must accept the {"q4","s"} head dict like
    llama.forward does — regression for the plain-@ crash."""
    from vitron_tpu.kernels.quantization import quantize_llama

    cfg, params = tiny
    qp = quantize_llama(params, bits=4, head=True)
    assert isinstance(qp["lm_head"], dict)
    srv = PagedServer(qp, cfg, num_blocks=32, block_size=4)
    sid = srv.add_request([5, 17, 3, 99, 42])
    out = srv.step_n(4)
    assert len(out[sid]) == 4
    assert all(isinstance(t, int) for t in out[sid])
