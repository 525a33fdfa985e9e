"""MPT decoder backbone (alternative LM, ALiBi attention).

JAX re-design of the reference's vendored MPT (reference:
vitron/model/language_model/mpt/{modeling_mpt,attention,blocks}.py and the
LlavaMPTForCausalLM wrapper llava_mpt.py:30+): pre-LN blocks with packed
QKV (Wqkv), ALiBi positional bias instead of RoPE (attention.py:283-300),
GELU MLP with expansion ratio 4, tied lm head (logits = h @ embed^T),
optional learned positional embeddings when alibi is off.

Stacked layers + lax.scan like the Llama backbone; the same KV-cache and
splice machinery apply (the multimodal wrapper only swaps the decoder).
The reference's Triton flash-attention path (mpt/flash_attn_triton.py) maps
to the same Pallas flash kernel with the ALiBi bias folded into the logits.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50368
    d_model: int = 2048
    n_heads: int = 16
    n_layers: int = 24
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    alibi: bool = True
    alibi_bias_max: float = 8.0
    learned_pos_emb: bool = False
    no_bias: bool = True
    layer_norm_eps: float = 1e-5
    param_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny(**kw) -> "MPTConfig":
        base = dict(vocab_size=256, d_model=64, n_heads=4, n_layers=2,
                    max_seq_len=128, param_dtype=jnp.float32,
                    compute_dtype=jnp.float32)
        base.update(kw)
        return MPTConfig(**base)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def gen_alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> np.ndarray:
    """ALiBi per-head slopes (attention.py:283-291): next-pow2 padding, odd
    heads dropped."""
    _n = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, _n + 1, dtype=np.float64) * (alibi_bias_max / _n)
    slopes = 1.0 / (2.0 ** m)
    if _n != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes.astype(np.float32)


def alibi_bias(n_heads: int, q_pos: jax.Array, k_pos: jax.Array,
               alibi_bias_max: float = 8.0, full: bool = False) -> jax.Array:
    """[H, Sq, Sk] bias = -slope * |distance| clamped at 0 for the causal
    half (the reference uses -(S-1..0) row offsets, attention.py:292-300:
    bias is most negative for the most distant key). full=True is the
    symmetric -|i-j| form prefix-LM / non-causal mode uses
    (attention.py:292-299, build_alibi_bias full=not causal)."""
    slopes = jnp.asarray(gen_alibi_slopes(n_heads, alibi_bias_max))
    diff = (k_pos[None, :] - q_pos[:, None]).astype(jnp.float32)
    dist = -jnp.abs(diff) if full else jnp.minimum(diff, 0.0)
    return slopes[:, None, None] * dist[None]


def init_params(rng: jax.Array, cfg: MPTConfig) -> Dict[str, Any]:
    d, l, ffn = cfg.d_model, cfg.n_layers, cfg.d_model * cfg.expansion_ratio
    ks = jax.random.split(rng, 6)

    def dense(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) / np.sqrt(shape[-2] if len(shape) > 1 else shape[0])).astype(cfg.param_dtype)

    params = {
        "wte": dense(ks[0], (cfg.vocab_size, d)),
        "layers": {
            "ln1": jnp.ones((l, d), cfg.param_dtype),
            "wqkv": dense(ks[1], (l, d, 3 * d)),
            "wo": dense(ks[2], (l, d, d)),
            "ln2": jnp.ones((l, d), cfg.param_dtype),
            "up": dense(ks[3], (l, d, ffn)),
            "down": dense(ks[4], (l, ffn, d)),
        },
        "norm_f": jnp.ones((d,), cfg.param_dtype),
    }
    if cfg.learned_pos_emb and not cfg.alibi:
        params["wpe"] = dense(ks[5], (cfg.max_seq_len, d))
    return params


def _ln_nobias(x, scale, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def forward(params: Dict[str, Any], cfg: MPTConfig, token_ids: jax.Array,
            positions: Optional[jax.Array] = None,
            attn_mask: Optional[jax.Array] = None,
            cache=None,
            prefix_mask: Optional[jax.Array] = None):
    """[B, S] -> logits [B, S, V] (tied head).

    Without a cache: causal prefill. With a llama.KVCache: writes this
    chunk's K/V at cache.index and attends the cache window with the ALiBi
    bias computed in slot space (contiguous, unpadded sequences — MPT decode
    assumes slot == position like the reference's past_key_values path,
    modeling_mpt.py:144+). Returns (logits, new_cache) when cached.

    prefix_mask: [B, S] bool — prefix-LM mode (modeling_mpt.py:99-132,
    hf_prefixlm_converter): positions marked True attend bidirectionally
    (the prompt), the rest stay causal. Prefill-only, like the reference
    (its _apply_prefix_mask requires the full-square bias)."""
    from vitron_tpu.models.llm.llama import KVCache

    b, s = token_ids.shape
    x = jnp.take(params["wte"], token_ids, axis=0).astype(cfg.compute_dtype)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        if cache is not None:
            positions = positions + cache.index
    if "wpe" in params:
        x = x + jnp.take(params["wpe"], positions, axis=0).astype(x.dtype)
    if attn_mask is None:
        attn_mask = jnp.ones((b, s), bool)
    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / (hd ** 0.5)

    if cache is None:
        causal = jnp.tril(jnp.ones((s, s), bool))
        allowed = causal[None, None]
        if prefix_mask is not None:
            # queries may attend any prefix position OR causally
            # (modeling_mpt.py:127-131: ~(causal | prefix) cannot attend)
            allowed = allowed | prefix_mask[:, None, None, :]
        mask = allowed & attn_mask[:, None, None, :]
        bias = alibi_bias(nh, jnp.arange(s), jnp.arange(s), cfg.alibi_bias_max,
                          full=prefix_mask is not None) \
            if cfg.alibi else jnp.zeros((nh, s, s))
    else:
        t = cache.k.shape[2]
        new_valid = jax.lax.dynamic_update_slice(cache.valid, attn_mask,
                                                 (0, cache.index))
        key_pos = jnp.arange(t)[None, None, None, :]
        q_pos = cache.index + jnp.arange(s)[None, None, :, None]
        mask = (key_pos <= q_pos) & new_valid[:, None, None, :]
        bias = alibi_bias(nh, cache.index + jnp.arange(s), jnp.arange(t),
                          cfg.alibi_bias_max) if cfg.alibi else \
            jnp.zeros((nh, s, t))

    def attend(q, k, v, tdim):
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) * scale
        logits = logits + bias[None]
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, cfg.d_model)

    def layer(x, lp):
        xn = _ln_nobias(x, lp["ln1"], cfg.layer_norm_eps)
        qkv = xn @ lp["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        att = attend(q, k, v, s)
        x = x + att @ lp["wo"]
        xn = _ln_nobias(x, lp["ln2"], cfg.layer_norm_eps)
        h = jax.nn.gelu(xn @ lp["up"], approximate=False)
        return x + h @ lp["down"], None

    def cached_layer(x, inputs):
        lp, layer_k, layer_v = inputs
        xn = _ln_nobias(x, lp["ln1"], cfg.layer_norm_eps)
        qkv = xn @ lp["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        layer_k = jax.lax.dynamic_update_slice(
            layer_k, k.astype(layer_k.dtype), (0, cache.index, 0, 0))
        layer_v = jax.lax.dynamic_update_slice(
            layer_v, v.astype(layer_v.dtype), (0, cache.index, 0, 0))
        att = attend(q, layer_k, layer_v, layer_k.shape[1])
        x = x + att @ lp["wo"]
        xn = _ln_nobias(x, lp["ln2"], cfg.layer_norm_eps)
        h = jax.nn.gelu(xn @ lp["up"], approximate=False)
        x = x + h @ lp["down"]
        return x, (layer_k, layer_v)

    if cache is None:
        x, _ = jax.lax.scan(layer, x, params["layers"])
        new_cache = None
    else:
        x, (nk, nv) = jax.lax.scan(cached_layer, x, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(k=nk, v=nv, index=cache.index + s, valid=new_valid)
    x = _ln_nobias(x, params["norm_f"], cfg.layer_norm_eps)
    logits = (x @ params["wte"].T).astype(jnp.float32)
    if cache is None:
        return logits
    return logits, new_cache


def convert_hf_mpt(state_dict, cfg: MPTConfig) -> Dict[str, Any]:
    """Reference MPT state dict (transformer.blocks.{i}.*) -> param tree."""
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    sd = {k: _np(v) for k, v in state_dict.items()}
    pfx = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    l = cfg.n_layers

    def stack_t(fmt):
        return np.stack([np.ascontiguousarray(sd[fmt.format(i)].T) for i in range(l)])

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(l)])

    params = {
        "wte": sd[pfx + "wte.weight"],
        "layers": {
            "ln1": stack(pfx + "blocks.{}.norm_1.weight"),
            "wqkv": stack_t(pfx + "blocks.{}.attn.Wqkv.weight"),
            "wo": stack_t(pfx + "blocks.{}.attn.out_proj.weight"),
            "ln2": stack(pfx + "blocks.{}.norm_2.weight"),
            "up": stack_t(pfx + "blocks.{}.ffn.up_proj.weight"),
            "down": stack_t(pfx + "blocks.{}.ffn.down_proj.weight"),
        },
        "norm_f": sd[pfx + "norm_f.weight"],
    }
    if (pfx + "wpe.weight") in sd:
        params["wpe"] = sd[pfx + "wpe.weight"]
    return params
