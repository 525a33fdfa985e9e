"""HF CLIP / LanguageBind vision checkpoint conversion.

Maps HF `CLIPVisionModel` (and the LanguageBind video variant with
temporal_attn / temporal_embedding / temporal_layer_norm1 per layer,
reference: languagebind/video/modeling_video.py:65-85) state dicts onto the
stacked-layer param tree of vitron_tpu.models.vision.vit.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from vitron_tpu.models.vision.vit import ViTConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    x = x.detach().cpu()
    if str(x.dtype) == "torch.bfloat16":
        x = x.float()
    return x.numpy()


def convert_hf_clip_vision(
    state_dict: Mapping[str, Any], cfg: ViTConfig, prefix: str = "vision_model."
) -> Dict[str, Any]:
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items() if k.startswith(prefix)}
    l = cfg.num_layers
    p = cfg.patch_size

    def stack_t(fmt):  # stacked, transposed projections
        return np.stack([np.ascontiguousarray(sd[fmt.format(i)].T) for i in range(l)])

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(l)])

    def attn(stem):
        return {
            "wq": stack_t(stem + ".q_proj.weight"), "bq": stack(stem + ".q_proj.bias"),
            "wk": stack_t(stem + ".k_proj.weight"), "bk": stack(stem + ".k_proj.bias"),
            "wv": stack_t(stem + ".v_proj.weight"), "bv": stack(stem + ".v_proj.bias"),
            "wo": stack_t(stem + ".out_proj.weight"), "bo": stack(stem + ".out_proj.bias"),
        }

    def ln(stem):
        return {"scale": stack(stem + ".weight"), "bias": stack(stem + ".bias")}

    # conv [H, 3, P, P] -> unfold matmul weight [(ph pw c), H]
    conv = sd["embeddings.patch_embedding.weight"]
    patch_proj = np.ascontiguousarray(
        conv.transpose(2, 3, 1, 0).reshape(p * p * 3, cfg.hidden_size)
    )
    layers: Dict[str, Any] = {
        "ln1": ln("encoder.layers.{}.layer_norm1"),
        "attn": attn("encoder.layers.{}.self_attn"),
        "ln2": ln("encoder.layers.{}.layer_norm2"),
        "fc1": stack_t("encoder.layers.{}.mlp.fc1.weight"),
        "b1": stack("encoder.layers.{}.mlp.fc1.bias"),
        "fc2": stack_t("encoder.layers.{}.mlp.fc2.weight"),
        "b2": stack("encoder.layers.{}.mlp.fc2.bias"),
    }
    if cfg.add_time_attn:
        layers["t_emb"] = stack("encoder.layers.{}.temporal_embedding")[:, 0]
        layers["t_ln"] = ln("encoder.layers.{}.temporal_layer_norm1")
        layers["t_attn"] = attn("encoder.layers.{}.temporal_attn")

    params = {
        "class_emb": sd["embeddings.class_embedding"],
        "patch_proj": patch_proj,
        "pos_emb": sd["embeddings.position_embedding.weight"],
        # LanguageBind names it pre_layrnorm (sic), same as HF CLIP
        "pre_ln": {"scale": sd["pre_layrnorm.weight"], "bias": sd["pre_layrnorm.bias"]},
        "layers": layers,
        "post_ln": {"scale": sd["post_layernorm.weight"], "bias": sd["post_layernorm.bias"]},
    }
    import jax

    dt = np.dtype("float32") if str(cfg.param_dtype) == "float32" else cfg.param_dtype
    return jax.tree.map(lambda x: np.asarray(x, np.float32).astype(dt), params)
