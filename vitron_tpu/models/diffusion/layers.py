"""Shared latent-diffusion building blocks.

JAX re-design of the GLIGEN/SD module zoo (reference:
modules/GLIGEN/demo/gligen/ldm/modules/attention.py and
diffusionmodules/{openaimodel,positionnet,util}.py). Functional params-in /
activations-out; convs run NHWC (TPU-native layout); attention uses one
batched einsum per block with fp32 softmax.

Includes GLIGEN's novelty, `gated_self_attention`
(attention.py:285-314): visual tokens concatenated with grounding tokens,
self-attended, added back through a tanh(alpha) gate that an external
scheduler anneals over sampling steps (task_grounded_generation.py:23-55).
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.kernels.group_norm import group_norm_sums
from vitron_tpu.kernels.quantization import matmul_maybe_quantized


# ---------------------------------------------------------------- primitives

def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               groups: int = 32, eps: float = 1e-6,
               stat_chunks: int = 1) -> jax.Array:
    """x: [..., H, W, C] (or [..., N, C]); normalize over spatial + group.

    Formulated as spatial reductions + a per-(sample, channel) affine so the
    big tensor is NEVER reshaped: the old [B, HW, G, C/G] view split the
    minor (lane) dimension into C/G=16 lanes, which pushed XLA's global
    layout assignment batch-minor and slowed every neighboring op — the
    reshape-free form is worth 1.05 -> 1.34 steps/s on the full video UNet
    (docs/PERF.md round-3 video notes). Stats stay in f32 (E[x^2]-E[x]^2 on
    f32 sums; inputs are bf16-scale activations, so the cancellation error
    is ~1e-7 relative)."""
    b = x.shape[0]
    c = x.shape[-1]
    n = int(np.prod(x.shape[1:-1])) * (c // groups)
    if os.environ.get("VITRON_GN_BARRIER") == "1":
        # Measured NEGATIVE on the SD UNet (r5): the xplane join shows XLA
        # fusing the stats' x^2 into the producing conv's epilogue and
        # materializing BOTH x and x^2 as full-size f32 tuple outputs (4x
        # the bf16 write traffic), with those conv fusions at 65-85% of
        # roofline vs 87% for plain convs. Forcing one bf16 materialization
        # here (so stats + normalize re-read it) LOSES e2e anyway: 53.0 ->
        # 51.2 CFG steps/s. Same physics as the r3/r4 video GN experiments:
        # the epilogue's extra writes are in-flight behind the MXU, while a
        # barrier serializes a real extra round-trip. Knob kept so later
        # hardware can re-measure.
        x = jax.lax.optimization_barrier(x)
    # Stats routed through kernels/group_norm.py: XLA producer-fused
    # reductions by default (the read-once Pallas pass measured SLOWER
    # e2e — see that module's docstring; VITRON_GN=pallas re-measures).
    #
    # stat_chunks > 1 (the video UNets' temporal blocks pass F): a [2, C]
    # stat row puts M=2 on 8-wide sublanes (4x waste) and forces the big
    # tensor through the frame-major view; computing [B*F, 2, C] partials
    # on the SAME folded view the spatial blocks use and summing them is
    # identical math (f32 partial-sum reassociation only).
    st = group_norm_sums(x.reshape(b * stat_chunks, -1, c))
    if stat_chunks > 1:
        st = st.reshape(b, stat_chunks, 2, c).sum(1)  # [B, 2, C] f32
    s1, s2 = st[:, 0], st[:, 1]
    x32 = x.astype(jnp.float32)
    g1 = s1.reshape(b, groups, c // groups).sum(-1)
    g2 = s2.reshape(b, groups, c // groups).sum(-1)
    mu = g1 / n
    var = g2 / n - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    invc = jnp.repeat(inv, c // groups, axis=-1)  # [B, C]
    muc = jnp.repeat(mu, c // groups, axis=-1)
    a = invc * scale.astype(jnp.float32)
    d = bias.astype(jnp.float32) - muc * a
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return (x32 * a.reshape(bshape) + d.reshape(bshape)).astype(x.dtype)


def layer_norm(x, p, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def conv2d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
           stride: int = 1, padding: int = 0) -> jax.Array:
    """x: [B, H, W, C_in]; w: [kh, kw, C_in, C_out] (HWIO).

    1x1 convs run as plain matmuls (XLA's conv lowering runs ~8 TF/s on
    current TPU runtimes vs 110 TF/s for dots; see kernels/conv2d.py for
    the 3x3 experiments).

    A quantized weight (the {"qc", "s"} dict of
    kernels/quantization.quantize_conv2d) routes to the W8A8 integer-MXU
    path — serving-only, see unet_sd_video.quantize_params."""
    if isinstance(w, dict):
        from vitron_tpu.kernels.quantization import conv2d_w8a8

        out = conv2d_w8a8(x, w, stride=stride, padding=padding)
        return out if b is None else out + b.astype(out.dtype)
    if w.shape[0] == w.shape[1] == 1 and stride == 1 and padding == 0:
        out = x @ w[0, 0].astype(x.dtype)
        return out if b is None else out + b.astype(out.dtype)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, 2H, 2W, C] nearest: broadcast + reshape.

    jax.image.resize(method="nearest") lowers to gather/select/pad chains
    that showed up as ~0.4 ms/step of non-MXU time in the SD UNet trace;
    the broadcast form is two trivially-fusable ops."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """[B] -> [B, dim]; cos-first ordering (reference util.py:160-180)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def fourier_embed(x: jax.Array, num_freqs: int = 8, temperature: float = 100.0) -> jax.Array:
    """GLIGEN FourierEmbedder (util.py:12-26): interleave sin/cos per freq
    band, concatenated along the last axis. x: [..., D] -> [..., 2*F*D]."""
    bands = temperature ** (jnp.arange(num_freqs, dtype=jnp.float32) / num_freqs)
    out = []
    for i in range(num_freqs):
        out.append(jnp.sin(bands[i] * x))
        out.append(jnp.cos(bands[i] * x))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------- attention

def _flash_blocks(n: int, m: int) -> tuple:
    """Pick (block_q, block_k) for an n x m attention site. block_q: the
    largest multiple-of-8 divisor of n up to 1024 (zero q padding when one
    exists — 720 -> 360, 2880 -> 480); block_k: 1024 > 512 when m divides
    cleanly, else 128 so the padded final k block wastes < one 128-lane
    tile (720 -> 768, not 1024).

    1024 blocks: r5 sweep at the SD site ([2,8,4096,40] bf16, non-causal,
    shift=0, distinct q per call) measured 0.593 ms vs 0.984 at 512x512 —
    4x4 grid steps instead of 8x8 amortize the per-block DMA + rescale
    overhead that dominates at D=40. 2048 blocks fail to compile (VMEM).
    The LLM paths pass explicit blocks and are not affected."""
    # no divisor (e.g. n=180): one q block padded to the next multiple of 8
    if n % 1024 == 0:
        bq = 1024
    else:
        bq = min(512, -(-n // 8) * 8)
        for d in range(min(512, n), 7, -1):
            if d % 8 == 0 and n % d == 0:
                bq = d
                break
    bk = 1024 if m % 1024 == 0 else (512 if m % 512 == 0 else 128)
    return bq, bk


def _flash_min() -> int:
    """Spatial self-attention below this many tokens stays on the XLA einsum
    path: at 720 tokens (video UNet) flash + padding measured slower e2e
    with 512-blocks; tuned blocks are routable via VITRON_FLASH_MIN for
    A/B. Read per trace (not at import) so setting the env var after the
    package is imported still takes effect."""
    return int(os.environ.get("VITRON_FLASH_MIN", "1024"))


def _mha(q, k, v, heads: int, scale: float) -> jax.Array:
    """q: [B, N, H*C]; k/v: [B, M, H*C] -> [B, N, H*C], fp32 softmax.

    Large self-attention (the UNets' spatial attention at 64x64 latents =
    4096 tokens) routes to the Pallas flash kernel (non-causal): the XLA
    einsum path materializes fp32 [B,H,N,M] (537 MB at 4096^2) and was
    ~60% of the measured SD UNet step time."""
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // heads
    q = q.reshape(b, n, heads, c)
    k = k.reshape(b, m, heads, c)
    v = v.reshape(b, m, heads, c)
    fmin = _flash_min()
    if n >= fmin and m >= fmin and jax.default_backend() == "tpu":
        from vitron_tpu.kernels.flash_attention import flash_attention
        bq, bk = _flash_blocks(n, m)

        # bf16 operands: the kernel is VPU-bound on the fp32 online softmax
        # at these head dims (40-160), so halving the MXU/HBM side is free
        # accuracy-wise (softmax stays fp32 in-kernel). softmax_shift=0:
        # post-LayerNorm q/k keep logits far inside the static-shift
        # softmax's safe range, and skipping the online-max machinery is
        # ~1.9x on the kernel
        out = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16), scale=float(scale),
                              causal=False, softmax_shift=0.0,
                              block_q=bq, block_k=bk)
        return out.astype(v.dtype).reshape(b, n, hc)
    sim = jnp.einsum("bnhc,bmhc->bhnm", q, k).astype(jnp.float32) * scale
    if v.dtype == jnp.bfloat16:
        # bf16 probability materialization: softmax stays f32 (max + exp +
        # rowsum inside the score-producing fusion) but the [B,H,N,M]
        # probability tensor round-trips HBM in bf16 and the normalization
        # divides AFTER the small attn@v output — halves the dominant HBM
        # traffic of the einsum path (the f32 scores are ~1.6 GB at the
        # video UNet's 720-token sites). f32 path below stays exact for
        # parity tests.
        # (static-shift softmax — dropping the max pass — measured 1.50 vs
        # 1.52 steps/s on the video UNet: XLA fuses the max into the score
        # fusion for free, so the safe max-subtracted form stays)
        mx = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        p = jnp.exp(sim - mx)
        s = jnp.sum(p, axis=-1)  # [B, H, N] f32, fused with exp producer
        out = jnp.einsum("bhnm,bmhc->bnhc", p.astype(jnp.bfloat16), v)
        out = out.astype(jnp.float32) / jnp.moveaxis(s, 1, 2)[..., None]
        return out.astype(v.dtype).reshape(b, n, hc)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhc->bnhc", attn, v)
    return out.reshape(b, n, hc)


def cross_attention(p: Dict[str, Any], x, context, heads: int) -> jax.Array:
    """Reference CrossAttention (attention.py:109-190): q from x, k/v from
    context, no biases; out projection with bias."""
    wq = p["to_q"]
    c = (wq["q8"] if isinstance(wq, dict) else wq).shape[1] // heads
    scale = c ** -0.5
    q = matmul_maybe_quantized(x, wq)
    k = matmul_maybe_quantized(context, p["to_k"])
    v = matmul_maybe_quantized(context, p["to_v"])
    out = _mha(q, k, v, heads, scale)
    return matmul_maybe_quantized(out, p["out_w"]) + p["out_b"]


def self_attention(p: Dict[str, Any], x, heads: int) -> jax.Array:
    return cross_attention(p, x, x, heads)


def geglu_ff(p: Dict[str, Any], x) -> jax.Array:
    """FeedForward with GEGLU (attention.py:44-71).

    Large bf16 TPU sites stream the [M, 2F] hidden tensor through VMEM via
    the fused Pallas kernel (kernels/geglu_ff.py) instead of round-tripping
    it in HBM; small/f32 workloads keep the plain XLA form (exact for
    parity tests)."""
    from vitron_tpu.kernels import geglu_ff as _gf

    if (not isinstance(p["proj_w"], dict)
            and _gf.usable(x, p["proj_w"], p["out_w"])):
        return _gf.geglu_ff_fused(x, p["proj_w"], p["proj_b"],
                                  p["out_w"], p["out_b"])
    h = matmul_maybe_quantized(x, p["proj_w"]) + p["proj_b"]
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    return matmul_maybe_quantized(h, p["out_w"]) + p["out_b"]


def gated_self_attention(p: Dict[str, Any], x, objs, heads: int,
                         gate_scale=1.0) -> jax.Array:
    """GatedSelfAttentionDense (attention.py:285-314): concat visual+objs,
    self-attend, keep the visual slice, add through tanh(alpha) gates.
    `gate_scale` is the externally-scheduled alpha (set_alpha_scale)."""
    n_visual = x.shape[1]
    objs_p = objs @ p["linear_w"] + p["linear_b"]
    cat = jnp.concatenate([x, objs_p], axis=1)
    attn_out = self_attention(p["attn"], layer_norm(cat, p["norm1"]), heads)
    x = x + gate_scale * jnp.tanh(p["alpha_attn"]) * attn_out[:, :n_visual]
    x = x + gate_scale * jnp.tanh(p["alpha_dense"]) * geglu_ff(
        p["ff"], layer_norm(x, p["norm2"]))
    return x


def basic_transformer_block(p: Dict[str, Any], x, context, objs, heads: int,
                            gate_scale=1.0) -> jax.Array:
    """BasicTransformerBlock (attention.py:318-349): self-attn -> GLIGEN
    fuser -> cross-attn -> GEGLU FF, pre-LN residuals."""
    x = self_attention(p["attn1"], layer_norm(x, p["norm1"]), heads) + x
    if "fuser" in p and objs is not None:
        x = gated_self_attention(p["fuser"], x, objs, heads, gate_scale)
    x = cross_attention(p["attn2"], layer_norm(x, p["norm2"]), context, heads) + x
    x = geglu_ff(p["ff"], layer_norm(x, p["norm3"])) + x
    return x


def spatial_transformer(p: Dict[str, Any], x, context, objs, heads: int,
                        gate_scale=1.0) -> jax.Array:
    """SpatialTransformer (attention.py:352-386): GN -> 1x1 proj_in ->
    transformer blocks over (h w) tokens -> 1x1 proj_out + residual.
    x: [B, H, W, C]."""
    b, h, w, c = x.shape
    x_in = x
    x = group_norm(x, p["norm_scale"], p["norm_bias"])
    x = conv2d(x, p["proj_in_w"], p["proj_in_b"])
    x = x.reshape(b, h * w, -1)
    for blk in p["blocks"]:
        x = basic_transformer_block(blk, x, context, objs, heads, gate_scale)
    x = x.reshape(b, h, w, -1)
    x = conv2d(x, p["proj_out_w"], p["proj_out_b"])
    return x + x_in


def position_net(p: Dict[str, Any], boxes, masks, text_embeddings,
                 fourier_freqs: int = 8) -> jax.Array:
    """GLIGEN PositionNet (positionnet.py:9-48): Fourier-embedded xyxy +
    phrase CLIP embeddings -> grounding tokens; padded slots replaced by the
    learned null embeddings. boxes [B,N,4], masks [B,N], text [B,N,768]."""
    m = masks[..., None]
    xyxy = fourier_embed(boxes, fourier_freqs)
    text = text_embeddings * m + (1 - m) * p["null_positive"]
    xyxy = xyxy * m + (1 - m) * p["null_position"]
    h = jnp.concatenate([text, xyxy], axis=-1)
    h = jax.nn.silu(h @ p["w0"] + p["b0"])
    h = jax.nn.silu(h @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]


# ---------------------------------------------------------------- converters

def _np(x):
    if isinstance(x, np.ndarray):
        return x
    x = x.detach().cpu()
    if str(x.dtype) in ("torch.bfloat16", "torch.float16"):
        x = x.float()
    return x.numpy()


def conv_w(sd, key):
    """torch conv [O, I, kh, kw] -> HWIO."""
    return np.ascontiguousarray(_np(sd[key]).transpose(2, 3, 1, 0))


def lin_w(sd, key):
    return np.ascontiguousarray(_np(sd[key]).T)


def convert_attention(sd, pfx) -> Dict[str, Any]:
    return {
        "to_q": lin_w(sd, pfx + "to_q.weight"),
        "to_k": lin_w(sd, pfx + "to_k.weight"),
        "to_v": lin_w(sd, pfx + "to_v.weight"),
        "out_w": lin_w(sd, pfx + "to_out.0.weight"),
        "out_b": _np(sd[pfx + "to_out.0.bias"]),
    }


def convert_ln(sd, pfx) -> Dict[str, Any]:
    return {"scale": _np(sd[pfx + "weight"]), "bias": _np(sd[pfx + "bias"])}


def convert_ff(sd, pfx) -> Dict[str, Any]:
    return {
        "proj_w": lin_w(sd, pfx + "net.0.proj.weight"),
        "proj_b": _np(sd[pfx + "net.0.proj.bias"]),
        "out_w": lin_w(sd, pfx + "net.2.weight"),
        "out_b": _np(sd[pfx + "net.2.bias"]),
    }


def convert_gated_sa(sd, pfx) -> Dict[str, Any]:
    return {
        "linear_w": lin_w(sd, pfx + "linear.weight"),
        "linear_b": _np(sd[pfx + "linear.bias"]),
        "attn": convert_attention(sd, pfx + "attn."),
        "ff": convert_ff(sd, pfx + "ff."),
        "norm1": convert_ln(sd, pfx + "norm1."),
        "norm2": convert_ln(sd, pfx + "norm2."),
        "alpha_attn": _np(sd[pfx + "alpha_attn"]),
        "alpha_dense": _np(sd[pfx + "alpha_dense"]),
    }


def convert_transformer_block(sd, pfx, with_fuser=True) -> Dict[str, Any]:
    p = {
        "attn1": convert_attention(sd, pfx + "attn1."),
        "attn2": convert_attention(sd, pfx + "attn2."),
        "ff": convert_ff(sd, pfx + "ff."),
        "norm1": convert_ln(sd, pfx + "norm1."),
        "norm2": convert_ln(sd, pfx + "norm2."),
        "norm3": convert_ln(sd, pfx + "norm3."),
    }
    if with_fuser and (pfx + "fuser.linear.weight") in sd:
        p["fuser"] = convert_gated_sa(sd, pfx + "fuser.")
    return p


def convert_spatial_transformer(sd, pfx, depth=1) -> Dict[str, Any]:
    return {
        "norm_scale": _np(sd[pfx + "norm.weight"]),
        "norm_bias": _np(sd[pfx + "norm.bias"]),
        "proj_in_w": conv_w(sd, pfx + "proj_in.weight"),
        "proj_in_b": _np(sd[pfx + "proj_in.bias"]),
        "proj_out_w": conv_w(sd, pfx + "proj_out.weight"),
        "proj_out_b": _np(sd[pfx + "proj_out.bias"]),
        "blocks": [
            convert_transformer_block(sd, f"{pfx}transformer_blocks.{i}.")
            for i in range(depth)
        ],
    }


def convert_position_net(sd, pfx="position_net.") -> Dict[str, Any]:
    return {
        "null_positive": _np(sd[pfx + "null_positive_feature"]),
        "null_position": _np(sd[pfx + "null_position_feature"]),
        "w0": lin_w(sd, pfx + "linears.0.weight"), "b0": _np(sd[pfx + "linears.0.bias"]),
        "w1": lin_w(sd, pfx + "linears.2.weight"), "b1": _np(sd[pfx + "linears.2.bias"]),
        "w2": lin_w(sd, pfx + "linears.4.weight"), "b2": _np(sd[pfx + "linears.4.bias"]),
    }


def position_net_with_image(p: Dict[str, Any], boxes, masks, text_masks,
                            image_masks, text_embeddings, image_embeddings,
                            fourier_freqs: int = 8) -> jax.Array:
    """GLIGEN text+image grounding PositionNet (positionnet_with_image.py:
    9-66): separate text/image MLP branches over Fourier boxes + CLIP
    features, concatenated to 2N grounding tokens. Used by the style /
    text-image-box pipeline (demo/app.py:84-91)."""
    m = masks[..., None]
    tm = text_masks[..., None]
    im = image_masks[..., None]
    xyxy = fourier_embed(boxes, fourier_freqs)
    text = text_embeddings * tm + (1 - tm) * p["null_text"]
    image = image_embeddings * im + (1 - im) * p["null_image"]
    xyxy = xyxy * m + (1 - m) * p["null_position"]

    def branch(feats, w):
        h = jnp.concatenate([feats, xyxy], axis=-1)
        h = jax.nn.silu(h @ w["w0"] + w["b0"])
        h = jax.nn.silu(h @ w["w1"] + w["b1"])
        return h @ w["w2"] + w["b2"]

    objs_text = branch(text, p["text"])
    objs_image = branch(image, p["image"])
    return jnp.concatenate([objs_text, objs_image], axis=1)


def convert_position_net_with_image(sd, pfx="position_net.") -> Dict[str, Any]:
    def mlp(stem):
        return {
            "w0": lin_w(sd, pfx + stem + ".0.weight"), "b0": _np(sd[pfx + stem + ".0.bias"]),
            "w1": lin_w(sd, pfx + stem + ".2.weight"), "b1": _np(sd[pfx + stem + ".2.bias"]),
            "w2": lin_w(sd, pfx + stem + ".4.weight"), "b2": _np(sd[pfx + stem + ".4.bias"]),
        }

    return {
        "null_text": _np(sd[pfx + "null_text_feature"]),
        "null_image": _np(sd[pfx + "null_image_feature"]),
        "null_position": _np(sd[pfx + "null_position_feature"]),
        "text": mlp("linears_text"),
        "image": mlp("linears_image"),
    }
