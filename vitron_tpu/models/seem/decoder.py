"""SEEM multi-scale masked-attention transformer decoder.

JAX re-design of MultiScaleMaskedTransformerDecoder + AttentionDataStruct
(reference: modules/SEEM/demo_code/xdecoder/body/decoder/seem.py:218-590,
utils/attention_data_struct.py; config seem_focall_lang.yaml:86-139):

- 101 learnable object queries, 9 decoder layers cycling over 3 feature
  scales; post-norm DETR layers;
- masked cross-attention: key blocked where the previous layer's mask
  prediction sigmoid < 0.5; fully-blocked query rows unblocked;
- self-attention over concatenated token groups with the ATTENTION_ARCH
  interaction matrix (yaml:114-139): object queries attend everything;
  grounding tokens attend object+grounding; spatial/visual tokens attend
  only themselves; padded token slots masked;
- prediction heads: decoder-norm -> class projection (language-similarity
  logits), 3-layer mask MLP -> einsum with mask features, mask-embedding
  outputs, pos/neg spatial/visual pooled queries for stroke/example
  matching.

Static shapes: token groups are fixed-size padded arrays with validity
masks (the reference pads ragged lists per call), so one compiled program
serves every request of a geometry bucket.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.seem.pixel_decoder import _ln, _mha, position_embedding_sine


@dataclasses.dataclass(frozen=True)
class SeemDecoderConfig:
    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 101
    num_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9        # DEC_LAYERS - 1 (yaml:99)
    mask_dim: int = 512
    num_feature_levels: int = 3
    max_spatial_len: int = 512

    @staticmethod
    def tiny(**kw) -> "SeemDecoderConfig":
        base = dict(hidden_dim=32, dim_proj=32, num_queries=7, num_heads=4,
                    dim_feedforward=64, dec_layers=3, mask_dim=32,
                    num_feature_levels=2, max_spatial_len=16)
        base.update(kw)
        return SeemDecoderConfig(**base)


def _layer_params(ki, d, ff):
    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout), jnp.float32) / np.sqrt(cin)

    def lnp():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def attn():
        return {"in_w": dense(d, 3 * d), "in_b": jnp.zeros((3 * d,)),
                "out_w": dense(d, d), "out_b": jnp.zeros((d,))}

    return {
        "cross": {"attn": attn(), "norm": lnp()},
        "self": {"attn": attn(), "norm": lnp()},
        "ffn": {"fc1_w": dense(d, ff), "fc1_b": jnp.zeros((ff,)),
                "fc2_w": dense(ff, d), "fc2_b": jnp.zeros((d,)),
                "norm": lnp()},
    }


def init_params(rng: jax.Array, cfg: SeemDecoderConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 512))
    d = cfg.hidden_dim

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout), jnp.float32) / np.sqrt(cin)

    return {
        "query_feat": dense(cfg.num_queries, d) * 0.02,
        "query_embed": dense(cfg.num_queries, d) * 0.02,
        "pn_indicator": dense(2, d) * 0.02,
        "level_embed": dense(cfg.num_feature_levels, d) * 0.02,
        "layers": [_layer_params(ki, d, cfg.dim_feedforward)
                   for _ in range(cfg.dec_layers)],
        "decoder_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "class_embed": dense(d, cfg.dim_proj) * 0.02,
        "mask_embed": {
            "w0": dense(d, d), "b0": jnp.zeros((d,)),
            "w1": dense(d, d), "b1": jnp.zeros((d,)),
            "w2": dense(d, cfg.mask_dim), "b2": jnp.zeros((cfg.mask_dim,)),
        },
        "mask_spatial_embed": [dense(d, d) * 0.02 for _ in range(cfg.num_feature_levels)],
    }


def point_sample(feat: jax.Array, points: jax.Array) -> jax.Array:
    """Bilinear sample (align_corners=True) — detectron2 point_sample
    equivalent. feat: [H, W, C]; points: [K, 2] normalized (y, x) in [0,1].
    Returns [K, C]."""
    h, w, c = feat.shape
    py = points[:, 0] * (h - 1)
    px = points[:, 1] * (w - 1)
    y0 = jnp.clip(jnp.floor(py), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = py - y0
    wx = px - x0
    f00 = feat[y0, x0]
    f01 = feat[y0, x1]
    f10 = feat[y1, x0]
    f11 = feat[y1, x1]
    return (f00 * ((1 - wy) * (1 - wx))[:, None] + f01 * ((1 - wy) * wx)[:, None]
            + f10 * (wy * (1 - wx))[:, None] + f11 * (wy * wx)[:, None])


def _self_attn_mask(nq, groups: List[Tuple[str, int, Optional[jax.Array]]]):
    """Build the [total, total] blocked-mask (True = blocked) per the
    ATTENTION_ARCH interaction matrix. groups: (name, size, valid[size])."""
    sizes = [nq] + [g[1] for g in groups]
    names = ["object"] + [g[0] for g in groups]
    total = sum(sizes)
    offs = np.cumsum([0] + sizes)
    blocked = jnp.ones((total, total), bool)
    valids = {g[0]: g[2] for g in groups}

    allowed = {
        "object": ["object", "grounding", "spatial", "visual", "audio"],
        "grounding": ["object", "grounding"],
        "spatial": ["spatial"],
        "visual": ["visual"],
        "audio": ["object", "audio"],
    }
    for i, ni in enumerate(names):
        for j, nj in enumerate(names):
            if nj in allowed.get(ni, []):
                block = jnp.zeros((sizes[i], sizes[j]), bool)
                # padding: keys of group j that are invalid stay blocked
                if nj != "object" and valids.get(nj) is not None:
                    block = block | ~valids[nj][None, :]
                if ni != "object" and valids.get(ni) is not None:
                    block = block | ~valids[ni][:, None]
                blocked = blocked.at[offs[i]:offs[i + 1], offs[j]:offs[j + 1]].set(block)
    return blocked


def forward(
    params: Dict[str, Any],
    cfg: SeemDecoderConfig,
    multi_scale_features: List[jax.Array],   # 3 x [B, h, w, hidden] (res5,4,3)
    mask_features: jax.Array,                # [B, H/4, W/4, mask_dim]
    class_embeddings: Optional[jax.Array] = None,  # [n_cls, dim_proj] for logits
    logit_scale: Optional[jax.Array] = None,
    grounding_tokens: Optional[jax.Array] = None,  # [T, hidden]
    grounding_valid: Optional[jax.Array] = None,   # [T] bool
    spatial_queries: Optional[List[jax.Array]] = None,  # per level [S, hidden]
    spatial_valid: Optional[jax.Array] = None,          # [S] bool
    spatial_pos_embed: Optional[jax.Array] = None,      # [1, hidden] pooled pos
    spatial_neg_embed: Optional[jax.Array] = None,
    visual_queries: Optional[List[jax.Array]] = None,
    visual_valid: Optional[jax.Array] = None,
    visual_pos_embed: Optional[jax.Array] = None,
    visual_neg_embed: Optional[jax.Array] = None,
    audio_tokens: Optional[jax.Array] = None,      # [T, hidden]
    audio_valid: Optional[jax.Array] = None,       # [T] bool
) -> Dict[str, jax.Array]:
    """Batch size 1 (the reference demo asserts bs==1). Returns pred_logits,
    pred_masks, pred_captions, pred_maskembs, pred_pspatials, pred_pvisuals."""
    d = cfg.hidden_dim
    nq = cfg.num_queries
    nl = cfg.num_feature_levels

    srcs, poss, sizes = [], [], []
    for i, f in enumerate(multi_scale_features):
        b, h, w, c = f.shape
        srcs.append(f.reshape(b, h * w, c) + params["level_embed"][i])
        poss.append(position_embedding_sine(h, w, d)[None].astype(f.dtype))
        sizes.append((h, w))

    output = jnp.broadcast_to(params["query_feat"][None], (1, nq, d))
    query_pos = jnp.broadcast_to(params["query_embed"][None], (1, nq, d))

    # grounding tokens are set ONCE and EVOLVE through self-attention across
    # layers, with their position embedding frozen at the original values
    # (seem.py:483-487 + attention_data_struct.update_variables); spatial /
    # visual tokens re-seed from their per-level sources every layer
    # (seem.py:519-533).
    g_state = grounding_tokens[None] if grounding_tokens is not None else None
    g_pos = grounding_tokens[None] if grounding_tokens is not None else None
    # audio tokens are transcript text embeddings routed through their own
    # token group (seem_model.py:291-299, seem.py:489-493); like grounding
    # they are set once and evolve through self-attention
    a_state = audio_tokens[None] if audio_tokens is not None else None
    a_pos = audio_tokens[None] if audio_tokens is not None else None

    groups: List[Tuple[str, int, Optional[jax.Array], Any]] = []
    if grounding_tokens is not None:
        groups.append(("grounding", grounding_tokens.shape[0], grounding_valid,
                       None))
    if spatial_queries is not None:
        groups.append(("spatial", spatial_queries[0].shape[0], spatial_valid,
                       lambda lvl: spatial_queries[lvl]))
    if visual_queries is not None:
        groups.append(("visual", visual_queries[0].shape[0], visual_valid,
                       lambda lvl: visual_queries[lvl]))
    if audio_tokens is not None:
        groups.append(("audio", audio_tokens.shape[0], audio_valid, None))

    blocked = _self_attn_mask(nq, [(g[0], g[1], g[2]) for g in groups])

    def prediction_heads(output, size):
        dec = _ln(output, params["decoder_norm"])
        class_embed = dec @ params["class_embed"]           # [1, nq, dim_proj]
        me = params["mask_embed"]
        m = jax.nn.relu(dec @ me["w0"] + me["b0"])
        m = jax.nn.relu(m @ me["w1"] + me["b1"])
        m = m @ me["w2"] + me["b2"]
        masks = jnp.einsum("bqc,bhwc->bqhw", m, mask_features)
        # cross-attn mask for next layer at `size`; antialias off to match
        # F.interpolate(mode='bilinear') (seem.py:565)
        am = jax.image.resize(masks, masks.shape[:2] + size, method="linear",
                              antialias=False)
        am = jax.nn.sigmoid(am.reshape(1, nq, -1)) < 0.5
        # unblock fully-blocked rows (seem.py attention_data_struct:185)
        all_blocked = jnp.all(am, axis=-1, keepdims=True)
        am = am & ~all_blocked
        return class_embed, masks, m, am

    class_embed, masks, maskemb, attn_mask = prediction_heads(output, sizes[0])

    for li in range(cfg.dec_layers):
        lvl = li % nl
        lp = params["layers"][li]
        # masked cross attention (object queries only)
        q = output + query_pos
        k = srcs[lvl] + poss[lvl]
        att = _masked_mha(q, k, srcs[lvl], lp["cross"]["attn"], cfg.num_heads,
                          attn_mask)
        output = _ln(output + att, lp["cross"]["norm"])

        # self attention over [queries | token groups]
        toks = [output]
        tok_pos = [query_pos]
        for name, size, valid, get in groups:
            if name == "grounding":
                toks.append(g_state)
                tok_pos.append(g_pos)
            elif name == "audio":
                toks.append(a_state)
                tok_pos.append(a_pos)
            else:
                t = get(lvl)[None]
                toks.append(t)
                tok_pos.append(t)  # pos = detached copy at set time (ref)
        cat = jnp.concatenate(toks, axis=1)
        cat_pos = jnp.concatenate(tok_pos, axis=1)
        qk = cat + cat_pos
        att = _masked_mha(qk, qk, cat, lp["self"]["attn"], cfg.num_heads,
                          blocked[None])
        cat = _ln(cat + att, lp["self"]["norm"])
        # FFN applies to the whole concatenation (reference FFNLayer)
        f = lp["ffn"]
        h2 = jax.nn.relu(cat @ f["fc1_w"] + f["fc1_b"]) @ f["fc2_w"] + f["fc2_b"]
        cat = _ln(cat + h2, f["norm"])
        output = cat[:, :nq]
        if g_state is not None:
            g_state = cat[:, nq:nq + g_state.shape[1]]
        if a_state is not None:  # audio is the last group in the concat
            a_state = cat[:, cat.shape[1] - a_state.shape[1]:]

        class_embed, masks, maskemb, attn_mask = prediction_heads(
            output, sizes[(li + 1) % nl])

    logits = None
    if class_embeddings is not None:
        v = class_embed / (jnp.linalg.norm(class_embed, axis=-1, keepdims=True) + 1e-7)
        scale = jnp.exp(logit_scale) if logit_scale is not None else 1.0
        logits = scale * v @ class_embeddings.T[None]

    return {
        "pred_logits": logits,
        "pred_masks": masks,
        "pred_captions": class_embed,
        "pred_maskembs": maskemb,
        "pred_pspatials": spatial_pos_embed,
        "pred_nspatials": spatial_neg_embed,
        "pred_pvisuals": visual_pos_embed,
        "pred_nvisuals": visual_neg_embed,
    }


def _masked_mha(q, k, v, p, heads, blocked):
    """MultiheadAttention with bool blocked-mask [B or 1, Q, K] or
    [B, h, Q, K]."""
    e = q.shape[-1]
    d = e // heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)
    qq = (q @ wq + bq).reshape(q.shape[0], q.shape[1], heads, d)
    kk = (k @ wk + bk).reshape(k.shape[0], k.shape[1], heads, d)
    vv = (v @ wv + bv).reshape(v.shape[0], v.shape[1], heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk).astype(jnp.float32) / np.sqrt(d)
    if blocked.ndim == 3:
        blocked = blocked[:, None]
    logits = jnp.where(blocked, jnp.finfo(jnp.float32).min, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(q.shape[0], q.shape[1], e)
    return out @ p["out_w"] + p["out_b"]


def sample_stroke_points(mask: np.ndarray, max_len: int, rng: np.random.RandomState):
    """Host-side: nonzero (y, x) coords of a stroke mask, randomly subsampled
    to max_len, normalized, padded. Mirrors rand_sample + padding
    (seem.py:419-430). Returns (points [max_len, 2], valid [max_len])."""
    ys, xs = np.nonzero(mask)
    pts = np.stack([ys / mask.shape[0], xs / mask.shape[1]], axis=1).astype(np.float32)
    if len(pts) > max_len:
        idx = rng.permutation(len(pts))[:max_len]
        pts = pts[idx]
    valid = np.zeros((max_len,), bool)
    valid[: len(pts)] = True
    out = np.zeros((max_len, 2), np.float32)
    out[: len(pts)] = pts
    return out, valid


def build_spatial_tokens(params, cfg: SeemDecoderConfig, srcs_2d: List[jax.Array],
                         mask_features: jax.Array, points: jax.Array,
                         valid: jax.Array, pos: bool = True):
    """Device-side: per-level spatial tokens from sampled stroke points
    (seem.py:436-459) + pooled pos embedding from mask features.

    srcs_2d: per level [h, w, hidden]; points: [S, 2] normalized (y, x);
    valid: [S]. Returns (per_level_tokens [S, hidden], pooled [1, hidden])."""
    per_level = []
    ind = params["pn_indicator"][0] if pos else params["pn_indicator"][1]
    for i, f in enumerate(srcs_2d):
        emb = f @ params["mask_spatial_embed"][i]
        toks = point_sample(emb, points)
        toks = toks + ind
        toks = jnp.where(valid[:, None], toks, 0.0)
        per_level.append(toks)
    sampled = point_sample(mask_features[0], points)
    denom = jnp.maximum(jnp.sum(valid), 1)
    pooled = jnp.sum(jnp.where(valid[:, None], sampled, 0.0), axis=0,
                     keepdims=True) / denom
    return per_level, pooled
