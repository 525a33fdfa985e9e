"""SEEM language encoder: CLIP-tokenized causal transformer + projection.

JAX re-design of LanguageEncoder / LangEncoder.Transformer (reference:
modules/SEEM/demo_code/xdecoder/language/vlpencoder.py:150-304 and
LangEncoder/transformer.py:77-160; config yaml:17-25: width 512, 12 layers,
heads 8, context 77, autoregressive). QuickGELU MLP, pre-LN residual blocks,
causal mask; pooled feature = final-LN hidden at argmax(token id) (EOT),
projected by lang_proj and L2-normalized; class-embedding cache averages
prompt templates (vlpencoder.py:219-244); vl_similarity with exp(logit_scale)
(the demo matching, tasks/interactive.py:162-175).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.seem.pixel_decoder import _ln


@dataclasses.dataclass(frozen=True)
class LangConfig:
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    context_length: int = 77
    dim_proj: int = 512
    autoregressive: bool = True
    # the vendored LangEncoder LayerNorm uses eps=1e-12 (transformer.py:55)
    layer_norm_eps: float = 1e-12

    @staticmethod
    def tiny(**kw) -> "LangConfig":
        base = dict(vocab_size=128, width=32, num_layers=2, num_heads=4,
                    context_length=16, dim_proj=32)
        base.update(kw)
        return LangConfig(**base)


PROMPT_TEMPLATES = [
    "a photo of a {}.",
    "This is a photo of a {}",
    "There is a {} in the scene",
    "There is the {} in the scene",
    "a photo of a {} in the scene",
    "a photo of a small {}.",
    "a photo of a medium {}.",
    "a photo of a large {}.",
    "a photo of the {}.",
    "a photo of the small {}.",
    "a photo of the medium {}.",
    "a photo of the large {}.",
]


def init_params(rng: jax.Array, cfg: LangConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 8))
    w, l = cfg.width, cfg.num_layers

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.float32) * 0.02

    def ln():
        return {"scale": jnp.ones((l, w)), "bias": jnp.zeros((l, w))}

    return {
        "token_emb": dense(next(ki), (cfg.vocab_size, w)),
        "pos_emb": dense(next(ki), (cfg.context_length, w)),
        "layers": {
            "ln1": ln(),
            "attn": {"in_w": dense(next(ki), (l, w, 3 * w)), "in_b": jnp.zeros((l, 3 * w)),
                     "out_w": dense(next(ki), (l, w, w)), "out_b": jnp.zeros((l, w))},
            "ln2": ln(),
            "fc1": dense(next(ki), (l, w, 4 * w)), "b1": jnp.zeros((l, 4 * w)),
            "fc2": dense(next(ki), (l, 4 * w, w)), "b2": jnp.zeros((l, w)),
        },
        "ln_final": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "lang_proj": dense(next(ki), (w, cfg.dim_proj)),
        "logit_scale": jnp.zeros(()),
    }


def _block(x, lp, heads, causal, eps):
    b, n, w = x.shape
    d = w // heads
    xn = _ln(x, lp["ln1"], eps)
    wq, wk, wv = jnp.split(lp["attn"]["in_w"], 3, axis=1)
    bq, bk, bv = jnp.split(lp["attn"]["in_b"], 3, axis=0)
    q = (xn @ wq + bq).reshape(b, n, heads, d)
    k = (xn @ wk + bk).reshape(b, n, heads, d)
    v = (xn @ wv + bv).reshape(b, n, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((n, n), bool))
        logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, w)
    x = x + att @ lp["attn"]["out_w"] + lp["attn"]["out_b"]
    xn = _ln(x, lp["ln2"], eps)
    h = xn @ lp["fc1"] + lp["b1"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    return x + h @ lp["fc2"] + lp["b2"]


def encode_tokens(params, cfg: LangConfig, token_ids: jax.Array) -> jax.Array:
    """[B, 77] -> last hidden state [B, 77, width] (post ln_final)."""
    x = jnp.take(params["token_emb"], token_ids, axis=0)
    x = x + params["pos_emb"][: x.shape[1]]

    def body(x, lp):
        return _block(x, lp, cfg.num_heads, cfg.autoregressive, cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _ln(x, params["ln_final"], cfg.layer_norm_eps)


def token_and_class_emb(params, cfg: LangConfig, token_ids: jax.Array,
                        norm: bool = False):
    """forward_language_token (vlpencoder.py:275-291): projected per-token
    embeddings + pooled class embedding at EOT."""
    hidden = encode_tokens(params, cfg, token_ids)
    eot = jnp.argmax(token_ids, axis=-1)
    class_x = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
    token_x = hidden @ params["lang_proj"]
    class_x = class_x @ params["lang_proj"]
    if norm:
        token_x = token_x / (jnp.linalg.norm(token_x, axis=-1, keepdims=True) + 1e-7)
        class_x = class_x / (jnp.linalg.norm(class_x, axis=-1, keepdims=True) + 1e-7)
    return token_x, class_x


def class_embeddings(params, cfg: LangConfig, tokenizer,
                     class_names: Sequence[str],
                     templates: Sequence[str] = tuple(PROMPT_TEMPLATES)) -> jax.Array:
    """Prompt-ensembled class embedding cache (vlpencoder.py:219-244):
    mean over templates, normalized. Returns [n_cls, dim_proj]."""
    out = []
    for cls in class_names:
        name = cls.replace("-other", "").replace("-merged", "").replace("-stuff", "")
        txts = [t.format(name) for t in templates]
        ids = tokenize(tokenizer, txts, cfg.context_length)
        _, emb = token_and_class_emb(params, cfg, jnp.asarray(ids), norm=True)
        mean = jnp.mean(emb, axis=0)
        out.append(mean / (jnp.linalg.norm(mean) + 1e-7))
    return jnp.stack(out)


def class_prompt_ids(tokenizer, class_names: Sequence[str], cfg: LangConfig,
                     templates: Sequence[str] = None) -> Tuple[np.ndarray, int]:
    """Host half of the class-bank build: tokenize every class x template
    prompt at once -> ([n_cls * T, 77] ids, T). Pairs with
    class_embeddings_from_ids so the device half is ONE jitted call instead
    of 133 eager per-class passes (vlpencoder.py:219-244)."""
    templates = tuple(templates) if templates else tuple(PROMPT_TEMPLATES)
    names = [c.replace("-other", "").replace("-merged", "").replace("-stuff", "")
             for c in class_names]
    txts = [t.format(n) for n in names for t in templates]
    return tokenize(tokenizer, txts, cfg.context_length), len(templates)


def class_embeddings_from_ids(params, cfg: LangConfig, ids: jax.Array,
                              n_templates: int) -> jax.Array:
    """Jittable device half: prompt-ensembled mean per class, normalized
    (vlpencoder.py:219-244). -> [n_cls, dim_proj]."""
    _, emb = token_and_class_emb(params, cfg, ids, norm=True)
    emb = emb.reshape(-1, n_templates, emb.shape[-1]).mean(axis=1)
    return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-7)


def tokenize(tokenizer, texts: List[str], max_length: int) -> np.ndarray:
    t = tokenizer(texts, padding="max_length", truncation=True,
                  max_length=max_length, return_tensors="np")
    return t["input_ids"]


def vl_similarity(image_feat: jax.Array, text_feat: jax.Array,
                  logit_scale: jax.Array) -> jax.Array:
    """Normalized similarity matching (tasks/interactive.py:162-175 uses
    lang_encoder.logit_scale as temperature): exp(scale) * t @ v^T."""
    return jnp.exp(logit_scale) * text_feat @ image_feat.T


def convert_torch(sd, cfg: LangConfig,
                  prefix: str = "sem_seg_head.predictor.lang_encoder.") -> Dict[str, Any]:
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    l = cfg.num_layers

    def stack_t(fmt):
        return np.stack([np.ascontiguousarray(g(fmt.format(i)).T) for i in range(l)])

    def stack(fmt):
        return np.stack([g(fmt.format(i)) for i in range(l)])

    return {
        "token_emb": g("lang_encoder.token_embedding.weight"),
        "pos_emb": g("lang_encoder.positional_embedding"),
        "layers": {
            "ln1": {"scale": stack("lang_encoder.resblocks.{}.ln_1.weight"),
                    "bias": stack("lang_encoder.resblocks.{}.ln_1.bias")},
            "attn": {
                "in_w": stack_t("lang_encoder.resblocks.{}.attn.in_proj_weight"),
                "in_b": stack("lang_encoder.resblocks.{}.attn.in_proj_bias"),
                "out_w": stack_t("lang_encoder.resblocks.{}.attn.out_proj.weight"),
                "out_b": stack("lang_encoder.resblocks.{}.attn.out_proj.bias"),
            },
            "ln2": {"scale": stack("lang_encoder.resblocks.{}.ln_2.weight"),
                    "bias": stack("lang_encoder.resblocks.{}.ln_2.bias")},
            "fc1": stack_t("lang_encoder.resblocks.{}.mlp.c_fc.weight"),
            "b1": stack("lang_encoder.resblocks.{}.mlp.c_fc.bias"),
            "fc2": stack_t("lang_encoder.resblocks.{}.mlp.c_proj.weight"),
            "b2": stack("lang_encoder.resblocks.{}.mlp.c_proj.bias"),
        },
        "ln_final": {"scale": g("lang_encoder.ln_final.weight"),
                     "bias": g("lang_encoder.ln_final.bias")},
        "lang_proj": g("lang_proj"),
        "logit_scale": g("logit_scale"),
    }
