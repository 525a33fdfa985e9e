"""CLIP text encoder (FrozenCLIPEmbedder).

JAX rebuild of the SD conditioning encoder (reference:
modules/GLIGEN/demo/gligen/ldm/modules/encoders/modules.py FrozenCLIPEmbedder
= HF CLIPTextModel ViT-L/14: 12 layers, hidden 768, heads 12, quick_gelu,
causal mask, final LayerNorm; output = last_hidden_state). StableVideo's
ControlNet uses the penultimate-layer variant ("clip_skip"), selectable via
`skip_last`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.vision.vit import layer_norm, quick_gelu


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    layer_norm_eps: float = 1e-5

    @staticmethod
    def clip_l(**kw) -> "TextConfig":
        return TextConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "TextConfig":
        base = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_length=16)
        base.update(kw)
        return TextConfig(**base)


def init_params(rng: jax.Array, cfg: TextConfig) -> Dict[str, Any]:
    h, l, ffn = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    ks = jax.random.split(rng, 8)

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.float32) / np.sqrt(shape[0])

    def stack(key, shape):
        return dense(key, (l,) + shape)

    def ln():
        return {"scale": jnp.ones((l, h)), "bias": jnp.zeros((l, h))}

    return {
        "token_emb": dense(ks[0], (cfg.vocab_size, h)),
        "pos_emb": dense(ks[1], (cfg.max_length, h)),
        "layers": {
            "ln1": ln(),
            "attn": {
                "wq": stack(ks[2], (h, h)), "bq": jnp.zeros((l, h)),
                "wk": stack(ks[3], (h, h)), "bk": jnp.zeros((l, h)),
                "wv": stack(ks[4], (h, h)), "bv": jnp.zeros((l, h)),
                "wo": stack(ks[5], (h, h)), "bo": jnp.zeros((l, h)),
            },
            "ln2": ln(),
            "fc1": stack(ks[6], (h, ffn)), "b1": jnp.zeros((l, ffn)),
            "fc2": stack(ks[7], (ffn, h)), "b2": jnp.zeros((l, h)),
        },
        "final_ln": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
    }


def _causal_mha(x, p, num_heads):
    b, n, h = x.shape
    d = h // num_heads
    q = (x @ p["wq"] + p["bq"]).reshape(b, n, num_heads, d)
    k = (x @ p["wk"] + p["bk"]).reshape(b, n, num_heads, d)
    v = (x @ p["wv"] + p["bv"]).reshape(b, n, num_heads, d)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) / np.sqrt(d)
    causal = jnp.tril(jnp.ones((n, n), bool))
    logits = jnp.where(causal[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, n, h)
    return out @ p["wo"] + p["bo"]


def encode(params: Dict[str, Any], cfg: TextConfig, token_ids: jax.Array,
           skip_last: int = 0) -> jax.Array:
    """token_ids: [B, 77] -> [B, 77, hidden]. skip_last=1 gives the
    penultimate hidden state (with final LN still applied, HF clip_skip
    convention used by SD2/ControlNet stacks)."""
    x = jnp.take(params["token_emb"], token_ids, axis=0)
    x = x + params["pos_emb"][: x.shape[1]]
    n_run = cfg.num_layers - skip_last
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(x, lp):
        x = x + _causal_mha(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), lp["attn"], cfg.num_heads)
        xn = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + quick_gelu(xn @ lp["fc1"] + lp["b1"]) @ lp["fc2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return layer_norm(x, params["final_ln"], cfg.layer_norm_eps)


def convert_hf_clip_text(state_dict, cfg: TextConfig,
                         prefix: str = "text_model.") -> Dict[str, Any]:
    """HF CLIPTextModel state dict -> stacked param tree. Also accepts the
    ldm FrozenCLIPEmbedder prefix 'cond_stage_model.transformer.text_model.'."""
    from vitron_tpu.models.vision.loader import _np

    for cand in ("cond_stage_model.transformer.text_model.", "transformer.text_model.", prefix):
        if any(k.startswith(cand) for k in state_dict):
            prefix = cand
            break
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items() if k.startswith(prefix)}
    l = cfg.num_layers

    def stack_t(fmt):
        return np.stack([np.ascontiguousarray(sd[fmt.format(i)].T) for i in range(l)])

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(l)])

    return {
        "token_emb": sd["embeddings.token_embedding.weight"],
        "pos_emb": sd["embeddings.position_embedding.weight"],
        "layers": {
            "ln1": {"scale": stack("encoder.layers.{}.layer_norm1.weight"),
                    "bias": stack("encoder.layers.{}.layer_norm1.bias")},
            "attn": {
                "wq": stack_t("encoder.layers.{}.self_attn.q_proj.weight"),
                "bq": stack("encoder.layers.{}.self_attn.q_proj.bias"),
                "wk": stack_t("encoder.layers.{}.self_attn.k_proj.weight"),
                "bk": stack("encoder.layers.{}.self_attn.k_proj.bias"),
                "wv": stack_t("encoder.layers.{}.self_attn.v_proj.weight"),
                "bv": stack("encoder.layers.{}.self_attn.v_proj.bias"),
                "wo": stack_t("encoder.layers.{}.self_attn.out_proj.weight"),
                "bo": stack("encoder.layers.{}.self_attn.out_proj.bias"),
            },
            "ln2": {"scale": stack("encoder.layers.{}.layer_norm2.weight"),
                    "bias": stack("encoder.layers.{}.layer_norm2.bias")},
            "fc1": stack_t("encoder.layers.{}.mlp.fc1.weight"),
            "b1": stack("encoder.layers.{}.mlp.fc1.bias"),
            "fc2": stack_t("encoder.layers.{}.mlp.fc2.weight"),
            "b2": stack("encoder.layers.{}.mlp.fc2.bias"),
        },
        "final_ln": {"scale": sd["final_layer_norm.weight"],
                     "bias": sd["final_layer_norm.bias"]},
    }
