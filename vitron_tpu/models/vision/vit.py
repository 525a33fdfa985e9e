"""CLIP ViT vision tower (image) + LanguageBind temporal variant (video).

TPU-native re-design of the reference towers:
- CLIP/LanguageBind image tower (reference:
  vitron/model/multimodal_encoder/clip_encoder.py:7-79 and
  languagebind/image/modeling_image.py:596): ViT-L/14, 224x224, pre-LN
  transformer, quick_gelu MLP, feature = hidden_states[select_layer][:, 1:]
  (select_layer=-2, drop CLS -> 256 patch tokens).
- LanguageBind video tower (reference: languagebind/video/modeling_video.py:
  65-140,600-675): the same ViT run per frame, with a per-layer temporal
  block — temporal position embedding + temporal self-attention over the
  T=8 frame axis, applied before spatial attention.

TPU-first choices:
- patchify is an unfold + one [N, P*P*3] x [P*P*3, H] matmul (MXU), not a
  conv; stride == kernel makes them identical.
- layers are stacked and executed with lax.scan; since only
  hidden_states[select_layer] is consumed downstream, the scan runs just
  `num_layers + select_layer + 1` layers — the reference computes the last
  layer and throws it away (clip_encoder.py:42-45).
- video frames fold into the batch dim for spatial attention and into the
  sequence dim for temporal attention: both are single large batched
  matmuls, never a Python loop over frames.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vitron_tpu.core.mesh import FSDP_AXIS, TENSOR_AXIS


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    select_layer: int = -2       # index into [embeds, layer1, ..., layerL]
    add_time_attn: bool = False  # video tower
    num_frames: int = 8
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def clip_vit_l14(**kw) -> "ViTConfig":
        return ViTConfig(**kw)

    @staticmethod
    def video_vit_l14(**kw) -> "ViTConfig":
        kw.setdefault("add_time_attn", True)
        return ViTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        base = dict(image_size=28, patch_size=7, hidden_size=32, num_layers=3,
                    num_heads=4, intermediate_size=64, num_frames=4)
        base.update(kw)
        return ViTConfig(**base)


# Stacked per-layer weights are [L, in, out]; biases and norms replicate.
VIT_SHARDING_RULES = (
    ("patch_proj", P(None, TENSOR_AXIS)),
    ("pos_emb", P()),
    ("t_emb", P()),
    ("wq", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wk", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wv", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("wo", P(None, TENSOR_AXIS, FSDP_AXIS)),
    ("fc1", P(None, FSDP_AXIS, TENSOR_AXIS)),
    ("fc2", P(None, TENSOR_AXIS, FSDP_AXIS)),
)


def _dense_init(key, shape, dtype):
    scale = 1.0 / jnp.sqrt(shape[0])
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _attn_block_init(key, h, l, dtype):
    ks = jax.random.split(key, 4)
    return {
        "wq": _dense_init(ks[0], (l, h, h), dtype), "bq": jnp.zeros((l, h), dtype),
        "wk": _dense_init(ks[1], (l, h, h), dtype), "bk": jnp.zeros((l, h), dtype),
        "wv": _dense_init(ks[2], (l, h, h), dtype), "bv": jnp.zeros((l, h), dtype),
        "wo": _dense_init(ks[3], (l, h, h), dtype), "bo": jnp.zeros((l, h), dtype),
    }


def _ln_init(l, h, dtype):
    return {"scale": jnp.ones((l, h), dtype), "bias": jnp.zeros((l, h), dtype)}


def init_params(rng: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    h, l, ffn = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    pdim = cfg.patch_size * cfg.patch_size * 3
    keys = jax.random.split(rng, 8)
    dt = cfg.param_dtype
    layers = {
        "ln1": _ln_init(l, h, dt),
        "attn": _attn_block_init(keys[0], h, l, dt),
        "ln2": _ln_init(l, h, dt),
        "fc1": _dense_init(keys[1], (l, h, ffn), dt),
        "b1": jnp.zeros((l, ffn), dt),
        "fc2": _dense_init(keys[2], (l, ffn, h), dt),
        "b2": jnp.zeros((l, h), dt),
    }
    if cfg.add_time_attn:
        layers["t_emb"] = (
            jax.random.normal(keys[3], (l, cfg.num_frames, h), jnp.float32)
            * h ** -0.5
        ).astype(dt)
        layers["t_ln"] = _ln_init(l, h, dt)
        layers["t_attn"] = _attn_block_init(keys[4], h, l, dt)
    return {
        "class_emb": _dense_init(keys[5], (h,), dt),
        "patch_proj": _dense_init(keys[6], (pdim, h), dt),
        "pos_emb": _dense_init(keys[7], (cfg.num_patches + 1, h), dt),
        "pre_ln": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        "layers": layers,
        "post_ln": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
    }


def layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(x, p, num_heads):
    """Bidirectional multi-head attention with fp32 softmax. x: [B, N, H]."""
    b, n, h = x.shape
    d = h // num_heads
    q = (x @ p["wq"] + p["bq"]).reshape(b, n, num_heads, d)
    k = (x @ p["wk"] + p["bk"]).reshape(b, n, num_heads, d)
    v = (x @ p["wv"] + p["bv"]).reshape(b, n, num_heads, d)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) / jnp.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, n, h)
    return out @ p["wo"] + p["bo"]


def patchify(pixels: jax.Array, cfg: ViTConfig) -> jax.Array:
    """[B, H, W, 3] -> [B, N, P*P*3] patch rows (ph, pw, c ordering)."""
    b, hh, ww, c = pixels.shape
    p = cfg.patch_size
    x = pixels.reshape(b, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (hh // p) * (ww // p), p * p * c)


def embed(params, cfg, pixels):
    """[B, H, W, 3] -> [B, N+1, H] (CLS + patches + position embeddings).
    If the params carry a folded normalization ("patch_bias" present, see
    fold_normalization_into_patch_proj), pixels should be RAW [0, 255]."""
    x = patchify(pixels.astype(cfg.compute_dtype), cfg) @ params["patch_proj"]
    if "patch_bias" in params:
        x = x + params["patch_bias"].astype(x.dtype)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["class_emb"], (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_emb"].astype(x.dtype)


def _num_scan_layers(cfg: ViTConfig) -> int:
    sel = cfg.select_layer
    if sel < 0:
        sel = cfg.num_layers + 1 + sel  # index into [emb, l1..lL]
    return sel  # hidden_states[sel] is produced after `sel` layers


def forward_features(params, cfg: ViTConfig, pixels: jax.Array) -> jax.Array:
    """Image tower: [B, H, W, 3] -> [B, num_patches, hidden] patch features.

    Equals reference feature_select(hidden_states[select_layer])[:, 1:]
    (languagebind/__init__.py:96-101).
    """
    x = embed(params, cfg, pixels)
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)
    n_run = _num_scan_layers(cfg)
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(x, lp):
        x = x + _mha(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), lp["attn"], cfg.num_heads)
        xn = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + quick_gelu(xn @ lp["fc1"] + lp["b1"]) @ lp["fc2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return x[:, 1:]  # drop CLS


def forward_pooled(params, cfg: ViTConfig, pixels: jax.Array,
                   visual_proj: jax.Array = None) -> jax.Array:
    """CLIP pooled image embedding: run ALL layers, post-LN CLS token,
    optional visual projection (HF CLIPModel.get_image_features). Used by
    GLIGEN's image-grounding feature extractor
    (task_grounded_generation.py:100-116)."""
    x = embed(params, cfg, pixels)
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)

    def body(x, lp):
        x = x + _mha(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), lp["attn"], cfg.num_heads)
        xn = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + quick_gelu(xn @ lp["fc1"] + lp["b1"]) @ lp["fc2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = layer_norm(x[:, 0], params["post_ln"], cfg.layer_norm_eps)
    if visual_proj is not None:
        pooled = pooled @ visual_proj
    return pooled


def forward_video_features(params, cfg: ViTConfig, pixels: jax.Array) -> jax.Array:
    """Video tower: [B, T, H, W, 3] -> [B, T, num_patches, hidden].

    Per-layer temporal attention over the frame axis, then spatial attention
    with frames folded into the batch (reference modeling_video.py:105-140).
    """
    b, t = pixels.shape[:2]
    x = embed(params, cfg, pixels.reshape((b * t,) + pixels.shape[2:]))
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)
    n_tok = x.shape[1]
    h = cfg.hidden_size
    n_run = _num_scan_layers(cfg)
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(x, lp):
        if cfg.add_time_attn:
            # temporal: [(b t), n, d] -> [(b n), t, d]
            xt = x.reshape(b, t, n_tok, h).transpose(0, 2, 1, 3).reshape(b * n_tok, t, h)
            if t != 1:
                xt = xt + lp["t_emb"][:t].astype(x.dtype)
            res = xt
            xt = layer_norm(xt, lp["t_ln"], cfg.layer_norm_eps)
            xt = res + _mha(xt, lp["t_attn"], cfg.num_heads)
            x = xt.reshape(b, n_tok, t, h).transpose(0, 2, 1, 3).reshape(b * t, n_tok, h)
        # spatial
        x = x + _mha(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), lp["attn"], cfg.num_heads)
        xn = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + quick_gelu(xn @ lp["fc1"] + lp["b1"]) @ lp["fc2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    x = x[:, 1:]  # drop CLS per frame
    return x.reshape(b, t, n_tok - 1, h)


def fold_normalization_into_patch_proj(params, cfg: ViTConfig,
                                       mean, std, scale255: bool = True):
    """Fold `(x/255 - mean)/std` into the patch projection so the tower
    consumes RAW uint8 pixels with ZERO preprocessing ops.

    out = norm(x)_patch @ W + pos  where norm is per-channel affine
        = (x_patch * a) @ W + (b_vec @ W) ... with a = 1/(255*std) folded
    into W's input rows (which are ordered (ph, pw, c)) and the constant
    shift folded into a new additive bias. The reference runs this
    arithmetic per-pixel on the CPU for every image
    (processing_image.py:40-55); here it costs nothing — the MXU does it as
    part of the patchify matmul.

    Returns a params tree whose patch_proj expects raw [0,255] pixels, with
    an extra "patch_bias" [hidden] entry applied by forward when present.
    """
    import numpy as np

    w = np.asarray(params["patch_proj"], np.float32)  # [(P*P*3), H]
    p = cfg.patch_size
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    a = 1.0 / std / (255.0 if scale255 else 1.0)      # per-channel scale
    shift = -mean / std                               # per-channel shift
    w_rows = w.reshape(p * p, 3, cfg.hidden_size)
    w_folded = (w_rows * a[None, :, None]).reshape(p * p * 3, cfg.hidden_size)
    bias = (np.tile(shift, p * p)[None] @ w).reshape(-1)
    out = dict(params)
    out["patch_proj"] = jnp.asarray(w_folded).astype(
        jnp.asarray(params["patch_proj"]).dtype)
    out["patch_bias"] = jnp.asarray(bias).astype(out["patch_proj"].dtype)
    return out
