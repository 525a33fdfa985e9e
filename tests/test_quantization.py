"""Weight-only quantization: error bounds + quantized llama generation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.kernels.quantization import (
    dequantize,
    matmul_maybe_quantized,
    quantize_int4,
    quantize_int8,
    quantize_llama,
)
from vitron_tpu.models.llm import llama


def test_int8_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q = quantize_int8(w)
    assert q["q"].dtype == jnp.int8
    err = jnp.abs(dequantize(q) - w).max() / jnp.abs(w).max()
    assert float(err) < 1.2 / 127


def test_int4_pack_unpack_exact():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
    q4 = quantize_int4(w)
    assert q4["q4"].shape == (16, 16)
    # unpack must reproduce the pre-pack int values exactly
    deq = dequantize(q4)
    err = jnp.abs(deq - w).max() / jnp.abs(w).max()
    assert float(err) < 1.2 / 7


def test_matmul_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.05
    exact = x @ w
    q8 = matmul_maybe_quantized(x, quantize_int8(w))
    rel = jnp.linalg.norm(q8 - exact) / jnp.linalg.norm(exact)
    assert float(rel) < 0.02
    plain = matmul_maybe_quantized(x, w)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(exact), rtol=1e-6)


def test_quantized_llama_generates_close_logits():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llama(params, bits=8)
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    pos = jnp.arange(12)[None]
    ref, _ = llama.forward_tokens(params, cfg, ids, positions=pos)
    got, _ = llama.forward_tokens(qparams, cfg, ids, positions=pos)
    # top-1 agreement on most positions
    agree = jnp.mean((jnp.argmax(ref, -1) == jnp.argmax(got, -1)).astype(jnp.float32))
    assert float(agree) >= 0.75
    # cached decode path also works quantized
    cache = llama.KVCache.create(cfg, 1, max_len=32)
    logits, cache = llama.forward_tokens(qparams, cfg, ids, positions=pos, cache=cache)
    assert bool(jnp.isfinite(logits).all())


def test_host_quantize_matches_device():
    from vitron_tpu.models.llm.loader import quantize_host

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    host = quantize_host(jax.tree.map(np.asarray, params), bits=8)
    dev = quantize_llama(params, bits=8)
    np.testing.assert_array_equal(host["layers"]["wq"]["q"],
                                  np.asarray(dev["layers"]["wq"]["q"]))
    np.testing.assert_allclose(host["layers"]["wq"]["s"],
                               np.asarray(dev["layers"]["wq"]["s"]), rtol=1e-6)


def test_int4_kernel_parity_interpret():
    from vitron_tpu.kernels.int4_matmul import int4_matmul
    from vitron_tpu.kernels.quantization import _unpack_int4

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 64).astype(np.float32))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96)) * 0.1
    q4 = quantize_int4(w)
    want = (x @ _unpack_int4(q4["q4"]).astype(jnp.float32)) * q4["s"]
    got = int4_matmul(x, q4["q4"], q4["s"].astype(jnp.float32),
                      block_n=32, block_k2=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_promote_int4_matches_packed_math():
    """promote_int4 (in-program packed->s4 expansion) must agree with the
    packed-dict matmul bit-for-bit at the int level."""
    from vitron_tpu.kernels.quantization import promote_int4, quantize_int4

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    q4 = quantize_int4(w)

    @jax.jit
    def via_s4(x, q4):
        tree = promote_int4({"layers": {"up": q4}})
        up = tree["layers"]["up"]
        assert up["q"].dtype == jnp.int4
        return matmul_maybe_quantized(x, up)

    got = np.asarray(via_s4(x, q4))
    want = np.asarray(matmul_maybe_quantized(x, q4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # int8 trees pass through with dtype unchanged
    from vitron_tpu.kernels.quantization import promote_int4 as p
    t8 = p({"layers": {"up": quantize_int8(w)}})
    assert t8["layers"]["up"]["q"].dtype == jnp.int8


def test_w4a8_integer_dot_accuracy():
    """The opt-in W4A8 path (promote_int4(a8=True) -> s8 x s4 integer dot):
    activation-quant error must stay at the bf16-rounding scale (~2^-8
    relative) vs the exact dequantized matmul. Kept as a gated option —
    measured NOT faster than the s4->bf16 convert path on v5e (r4,
    kernels/quantization.py w4a8_default docstring)."""
    from vitron_tpu.kernels.quantization import (dequantize, promote_int4,
                                                 quantize_int4)

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    q4 = quantize_int4(w)

    @jax.jit
    def via_a8(x, q4):
        tree = promote_int4({"up": q4}, a8=True)
        assert tree["up"]["qa8"].dtype == jnp.int4
        return matmul_maybe_quantized(x, tree["up"])

    got = np.asarray(via_a8(x, q4))
    exact = np.asarray(x @ dequantize(q4).astype(x.dtype))
    scale = np.abs(exact).max()
    assert np.max(np.abs(got - exact)) < 2 ** -7 * scale


def test_generate_scan_int4_promotes():
    """generate_scan on an int4-quantized model runs end-to-end (the s4
    promotion happens inside the jitted program)."""
    from vitron_tpu.mm.splice import plan_splice
    from vitron_tpu.models import vitron_model
    from vitron_tpu.runtime.generation import generate_scan

    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["llm"] = quantize_llama(params["llm"], bits=4)
    ids = [[1, 5, 9, 4, 7, 2]]
    plan = plan_splice(ids, media_kinds=[], pad_len=16)
    arrays = (jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
              jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
              jnp.asarray(plan.attention_mask), jnp.asarray(plan.seq_lens))
    toks = jax.jit(lambda p, a, r: generate_scan(p, cfg, a, 4, r))(
        params, arrays, jax.random.PRNGKey(0))
    assert toks.shape == (1, 4)
    assert bool(jnp.isfinite(toks.astype(jnp.float32)).all())


def test_quantized_lm_head():
    """head=True quantizes lm_head and the forward dispatches it through
    matmul_maybe_quantized (serving default; docs/PERF.md attribution)."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    pos = jnp.arange(12)[None]
    ref, _ = llama.forward_tokens(params, cfg, ids, positions=pos)
    q8 = quantize_llama(params, bits=8, head=True)
    assert isinstance(q8["lm_head"], dict)
    got, _ = llama.forward_tokens(q8, cfg, ids, positions=pos)
    agree = jnp.mean((jnp.argmax(ref, -1) == jnp.argmax(got, -1))
                     .astype(jnp.float32))
    assert float(agree) >= 0.75, float(agree)
    # int4 head: the dict dispatch must equal running the dequantized dense
    # head (tiny random logits are near-tied, so argmax-agreement vs the
    # unquantized ref is not a meaningful bar at this scale)
    from vitron_tpu.kernels.quantization import dequantize

    q4 = quantize_llama(params, bits=4, head=True)
    got4, _ = llama.forward_tokens(q4, cfg, ids, positions=pos)
    deq = {**q4, "lm_head": dequantize(q4["lm_head"]).astype(jnp.float32)}
    want4, _ = llama.forward_tokens(deq, cfg, ids, positions=pos)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                               rtol=2e-2, atol=2e-2)

    # host path quantizes the head by default (production loader)
    from vitron_tpu.models.llm.loader import quantize_host

    host = quantize_host(jax.tree.map(np.asarray, params), bits=8)
    assert isinstance(host["lm_head"], dict) and "q" in host["lm_head"]
    hostn = quantize_host(jax.tree.map(np.asarray, params), bits=8,
                          head=False)
    assert not isinstance(hostn["lm_head"], dict)


def test_w8a8_conv_and_dot_accuracy():
    """The video UNet's serving-quantization primitives: conv2d dispatch on
    the {"qc","s"} dict and matmul dispatch on {"q8","s"} match the f32
    math within int8 tolerance (per-channel weight + dynamic per-tensor /
    per-row activation scales)."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.kernels.quantization import (
        conv2d_w8a8,
        matmul_maybe_quantized,
        quantize_conv2d,
        quantize_int8_a8,
    )
    from vitron_tpu.models.diffusion.layers import conv2d

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 32))
    w = jax.random.normal(ks[1], (3, 3, 32, 48)) * 0.05
    b = jax.random.normal(ks[2], (48,)) * 0.1
    want = conv2d(x, w, b, padding=1)
    got = conv2d(x, quantize_conv2d(w), b, padding=1)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel
    # stride-2 path (up/downsample convs)
    want2 = conv2d(x, w, b, stride=2, padding=1)
    got2 = conv2d(x, quantize_conv2d(w), b, stride=2, padding=1)
    rel2 = float(jnp.linalg.norm(got2 - want2) / jnp.linalg.norm(want2))
    assert rel2 < 0.03, rel2

    xd = jax.random.normal(ks[2], (6, 10, 64))
    wd = jax.random.normal(ks[3], (64, 96)) * 0.05
    wantd = xd @ wd
    gotd = matmul_maybe_quantized(xd, quantize_int8_a8(wd))
    reld = float(jnp.linalg.norm(gotd - wantd) / jnp.linalg.norm(wantd))
    assert reld < 0.03, reld
    assert conv2d_w8a8(x, quantize_conv2d(w), padding=1).dtype == x.dtype


@pytest.mark.nightly
def test_video_unet_w8a8_quality():
    """quantize_params end-to-end on the tiny video UNet: the W8A8 forward
    tracks the f32 forward within a few percent (random weights, zero-init
    convs randomized so the output is nonzero)."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.diffusion import unet_sd_video as usv

    cfg = usv.UNetSDVideoConfig.tiny("t2v", context_dim=16, y_dim=16)
    params = usv.init_params(jax.random.PRNGKey(0), cfg)
    cnt = [0]

    def rnd(p):
        if (p.dtype == jnp.float32 and p.ndim >= 2
                and float(jnp.abs(p).max()) == 0.0):
            cnt[0] += 1
            return jax.random.normal(jax.random.PRNGKey(cnt[0]),
                                     p.shape) * 0.02
        return p

    params = jax.tree.map(rnd, params)
    qp = usv.quantize_params(params, min_channels=8, min_dot_dim=8,
                             min_tconv_dim=8)
    n_q = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda v: int(v.dtype == jnp.int8), qp))
    assert n_q > 10, n_q
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 8, 8, cfg.in_dim))
    t = jnp.asarray([3.0, 5.0])
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 77, cfg.context_dim))
    want = usv.forward(params, cfg, x, t, y=ctx)
    got = usv.forward(qp, cfg, x, t, y=ctx)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.06, rel
    # production default is conv-only (dots/tconv measured negative e2e):
    # no "q8"/"q8t" dicts appear, only "qc" conv weights
    flat = jax.tree_util.tree_flatten_with_path(
        usv.quantize_params(params, min_channels=8))[0]
    keys = {str(path[-1]) for path, _ in flat}
    assert not any("q8" in k for k in keys), keys
    assert any("qc" in k for k in keys), keys


@pytest.mark.nightly
def test_sd_unet_w8a8_quality():
    """unet2d.quantize_params end-to-end on the tiny SD UNet: the W8A8
    forward tracks the f32 forward within a few percent, grounding
    position_net stays untouched, and IO convs stay full precision."""
    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.diffusion import unet2d

    cfg = unet2d.UNetConfig.tiny()
    params = unet2d.init_params(jax.random.PRNGKey(0), cfg, grounding=True)
    cnt = [0]

    def rnd(p):
        if (p.dtype == jnp.float32 and p.ndim >= 2
                and float(jnp.abs(p).max()) == 0.0):
            cnt[0] += 1
            return jax.random.normal(jax.random.PRNGKey(cnt[0]),
                                     p.shape) * 0.02
        return p

    params = jax.tree.map(rnd, params)
    qp = unet2d.quantize_params(params, min_channels=8)
    n_q = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda v: int(v.dtype == jnp.int8), qp))
    assert n_q > 5, n_q
    # position_net (all 2-D linears) and the 4-channel IO convs untouched
    assert all(not isinstance(v, dict)
               for v in qp["position_net"].values())
    assert qp["out_w"].dtype == params["out_w"].dtype
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, cfg.in_channels))
    t = jnp.asarray([3.0, 5.0])
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 77, cfg.context_dim))
    objs = jax.random.normal(jax.random.PRNGKey(9), (2, 4, cfg.context_dim))
    want = unet2d.forward(params, cfg, x, t, ctx, objs)
    got = unet2d.forward(qp, cfg, x, t, ctx, objs)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.06, rel
