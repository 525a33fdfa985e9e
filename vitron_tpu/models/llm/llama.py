"""Llama (Vicuna-7B) decoder in pure functional JAX.

TPU-first re-design of the reference's LM backbone
(reference: vitron/model/language_model/llava_llama.py:29-117, which wraps HF
LlamaForCausalLM). Differences from the reference, by design:

- layers are **stacked** into single leading-dim arrays and executed with
  `lax.scan` — one compiled layer body regardless of depth, remat-friendly;
- static shapes everywhere: padded prefill + a preallocated ring KV cache
  updated with `lax.dynamic_update_slice` (the HF generate loop reallocates
  the cache each step);
- attention is pluggable: a fused Pallas flash-attention kernel on TPU
  (vitron_tpu/kernels/flash_attention.py) or an XLA einsum path (CPU/tests).
  This replaces the reference's flash-attn monkey patches
  (vitron/train/llama_flash_attn_monkey_patch.py:16-115);
- weights live as [in, out] matrices so every projection is `x @ w` on the
  MXU; params/compute bfloat16, softmax/norms float32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vitron_tpu.core.mesh import FSDP_AXIS, TENSOR_AXIS


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 4096
    attn_impl: str = "xla"  # "xla" | "flash" | "ring"
    context_axis: str = "context"  # mesh axis for attn_impl="ring"
    remat: bool = False
    param_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def vicuna_7b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Small config for CPU tests."""
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4, max_seq_len=128,
            param_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
        base.update(kw)
        return LlamaConfig(**base)


# Sharding rules: param-path substring -> PartitionSpec. Column-parallel
# projections split the output dim over `tensor`; row-parallel the input dim.
# `fsdp` shards the complementary dim ZeRO-3 style. Stacked per-layer weights
# are [L, in, out] -> the layer dim stays unsharded.
LLAMA_SHARDING_RULES = (
    ("embed", P(TENSOR_AXIS, FSDP_AXIS)),
    ("wq", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wk", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wv", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wo", P(None, TENSOR_AXIS, FSDP_AXIS)),
    ("gate", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("up", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("down", P(None, TENSOR_AXIS, FSDP_AXIS)),
    ("lm_head", P(FSDP_AXIS, TENSOR_AXIS)),
    ("norm", P()),
)


def init_params(rng: jax.Array, cfg: LlamaConfig) -> Dict[str, Any]:
    """Random-init param tree (tests / from-scratch training)."""
    h, ffn, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    kvd = cfg.num_kv_heads * cfg.head_dim
    keys = jax.random.split(rng, 8)

    def dense(key, shape):
        scale = 1.0 / jnp.sqrt(shape[0])
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.param_dtype)

    def stack(key, shape):
        return dense(key, (l,) + shape)

    return {
        "embed": dense(keys[0], (cfg.vocab_size, h)),
        "layers": {
            "attn_norm": jnp.ones((l, h), cfg.param_dtype),
            "wq": stack(keys[1], (h, h)),
            "wk": stack(keys[2], (h, kvd)),
            "wv": stack(keys[3], (h, kvd)),
            "wo": stack(keys[4], (h, h)),
            "mlp_norm": jnp.ones((l, h), cfg.param_dtype),
            "gate": stack(keys[5], (h, ffn)),
            "up": stack(keys[6], (h, ffn)),
            "down": stack(keys[7], (ffn, h)),
        },
        "final_norm": jnp.ones((h,), cfg.param_dtype),
        "lm_head": dense(jax.random.fold_in(rng, 99), (h, cfg.vocab_size)),
    }


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32.astype(dt)) * w.astype(dt)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin tables for given positions [B, S] -> [B, S, head_dim]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B,S,D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, N, D]; cos/sin: [B, S, D]. HF rotate_half convention."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s


@dataclasses.dataclass
class KVCache:
    """Preallocated per-layer KV cache, written with dynamic_update_slice.

    k/v: [L, B, max_len, num_kv_heads, head_dim]; index: scalar fill level;
    valid: [B, max_len] marks slots holding real (non-pad) tokens so
    right-padded batch rows never attend each other's padding.
    """

    k: jax.Array
    v: jax.Array
    index: jax.Array  # int32 scalar
    valid: jax.Array  # bool [B, max_len]

    @staticmethod
    def create(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None) -> "KVCache":
        max_len = max_len or cfg.max_seq_len
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return KVCache(
            k=jnp.zeros(shape, cfg.compute_dtype),
            v=jnp.zeros(shape, cfg.compute_dtype),
            index=jnp.zeros((), jnp.int32),
            valid=jnp.zeros((batch, max_len), bool),
        )


jax.tree_util.register_dataclass(KVCache, ["k", "v", "index", "valid"], [])


def _attend_xla(q, k, v, mask, scale):
    """Reference attention: [B,S,N,D]x[B,T,K,D] with fp32 softmax.

    mask: bool [B, 1, S, T] (True = attend).
    """
    b, s, n, d = q.shape
    t = k.shape[1]
    kv_heads = k.shape[2]
    groups = n // kv_heads
    q = q.reshape(b, s, kv_heads, groups, d)
    logits = jnp.einsum("bskgd,btkd->bkgst", q, k).astype(jnp.float32) * scale
    logits = logits.reshape(b, n, s, t)
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    probs = probs.reshape(b, kv_heads, groups, s, t)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(b, s, n, d)


def _mm(x, w):
    from vitron_tpu.kernels.quantization import matmul_maybe_quantized

    return matmul_maybe_quantized(x, w)


def _attend(q, k, v, mask, scale, impl: str, kv_mask=None, q_offset=0,
            mesh=None, context_axis="context"):
    """mask: dense [B,1,S,T] (XLA path); kv_mask/q_offset: flash-path
    equivalent (causal in key-slot space + per-slot validity).

    impl="ring" (prefill only, requires `mesh` with a sized context axis):
    sequence-parallel ring attention over ICI (distributed/ring_attention.py)
    — the long-video capability the reference lacks (it drops videos to 8
    frames, processing_video.py:93). The ring path assumes densely packed
    sequences (attn_mask all True) sharded contiguously over the axis."""
    if impl == "ring" and q.shape[1] > 1 and mesh is not None:
        from vitron_tpu.distributed.ring_attention import ring_attention

        groups = q.shape[2] // k.shape[2]
        if groups > 1:  # GQA: expand K/V heads for the ring einsum
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
        return ring_attention(q, k, v, mesh, axis_name=context_axis,
                              scale=float(scale), causal=True)
    if impl == "flash" and q.shape[1] > 1:
        from vitron_tpu.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask, q_offset=q_offset,
                               scale=float(scale))
    return _attend_xla(q, k, v, mask, scale)


def forward(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    input_embeds: jax.Array,          # [B, S, H]
    positions: jax.Array,             # [B, S] int32
    attn_mask: Optional[jax.Array] = None,  # [B, S] bool, True = real token
    cache: Optional[KVCache] = None,
    return_hidden: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder.

    Without a cache: causal prefill over S (logits for every position).
    With a cache: writes this chunk's K/V at cache.index and attends over the
    full cache window (prefill chunks AND single-token decode use the same
    code path; S=1 for decode).
    """
    b, s, h = input_embeds.shape
    x = input_embeds.astype(cfg.compute_dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    scale = 1.0 / (cfg.head_dim ** 0.5)

    if attn_mask is None:
        attn_mask = jnp.ones((b, s), bool)

    if cache is None:
        # mask[b,1,i,j]: causal & key valid
        causal = jnp.tril(jnp.ones((s, s), bool))
        mask = causal[None, None] & attn_mask[:, None, None, :]
        kv_mask, q_offset = attn_mask, 0
    else:
        t = cache.k.shape[2]
        new_valid = jax.lax.dynamic_update_slice(
            cache.valid, attn_mask, (0, cache.index))
        # slot-causal (query at slot index+i sees slots <= index+i) AND the
        # key slot must hold a real token of the same row
        key_pos = jnp.arange(t)[None, None, None, :]
        q_pos = cache.index + jnp.arange(s)[None, None, :, None]
        mask = (key_pos <= q_pos) & new_valid[:, None, None, :]
        kv_mask, q_offset = new_valid, cache.index

    def layer(x, lp):
        xn = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = _mm(xn, lp["wq"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = _mm(xn, lp["wk"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _mm(xn, lp["wv"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out = _attend(q, k, v, mask, scale, cfg.attn_impl,
                           kv_mask=kv_mask, q_offset=q_offset,
                           mesh=mesh, context_axis=cfg.context_axis)
        x = x + _mm(attn_out.reshape(b, s, h), lp["wo"])
        xn = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mm(jax.nn.silu(_mm(xn, lp["gate"])) * _mm(xn, lp["up"]), lp["down"])
        return x, None

    def cached_layer(carry, inputs):
        # the FULL stacked cache rides in the carry and is written with a
        # single-slot dynamic_update_slice per layer: XLA aliases scan
        # carries, so the cache updates in place. (The previous version
        # returned each layer's full [T]-slot k/v as stacked scan OUTPUTS,
        # which materialized a fresh whole cache every decode step —
        # 2 x 214 MB of writes per token at 7B/384 slots.)
        x, kc, vc = carry
        lp, li = inputs
        xn = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = _mm(xn, lp["wq"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = _mm(xn, lp["wk"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _mm(xn, lp["wv"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc = jax.lax.dynamic_update_slice(
            kc, k.astype(kc.dtype)[None], (li, 0, cache.index, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.astype(vc.dtype)[None], (li, 0, cache.index, 0, 0))
        layer_k = jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False)
        layer_v = jax.lax.dynamic_index_in_dim(vc, li, 0, keepdims=False)
        attn_out = _attend(q, layer_k, layer_v, mask, scale, cfg.attn_impl,
                           kv_mask=kv_mask, q_offset=q_offset)
        x = x + _mm(attn_out.reshape(b, s, h), lp["wo"])
        xn = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mm(jax.nn.silu(_mm(xn, lp["gate"])) * _mm(xn, lp["up"]), lp["down"])
        return (x, kc, vc), None

    layers = params["layers"]
    if cache is None:
        body = layer
        if cfg.remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, layers)
        new_cache = None
    else:
        body = cached_layer
        if cfg.remat:
            body = jax.checkpoint(body)
        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (layers, jnp.arange(cfg.num_layers, dtype=jnp.int32)))
        new_cache = KVCache(k=new_k, v=new_v, index=cache.index + s, valid=new_valid)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    # _mm so a quantized lm_head ({"q"/"q4","s"}) works: the bf16 head is
    # 262 MB — 8% of a 7B int4 decode step's HBM traffic, measured 0.37
    # ms/tok (docs/PERF.md decode attribution)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    if return_hidden:
        return logits, new_cache, x
    return logits, new_cache


def forward_tokens(params, cfg, token_ids, **kw):
    """Convenience: embed token ids then run forward."""
    embeds = jnp.take(params["embed"], token_ids, axis=0)
    return forward(params, cfg, embeds, **kw)
