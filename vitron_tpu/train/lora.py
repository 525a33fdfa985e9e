"""LoRA for the stacked-layer Llama (+ projector/region fine-tune flags).

Rebuilds the reference PEFT setup (reference: vitron/train/train.py:
181-196,1102-1118; finetune recipe r=128 alpha=256, finetune_lora.sh:11):
LoRA targets every LLM linear projection, explicitly EXCLUDING the
multimodal projector, vision towers and region extractor
(find_all_linear_names drops 'mm_projector'/'image_tower'/'region_extractor',
train.py:181-196); those modules are instead fully trainable or frozen via
flags (train.py:1185-1212).

TPU-first: LoRA deltas merge functionally inside the loss —
`W_eff = W + (A @ B) * alpha/r` with stacked [L, in, r]/[L, r, out]
factors — so the frozen base stays bf16-resident and only the factors get
optimizer state (grads flow to A/B through the merge; base grads are
discarded by the trainable filter).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

LORA_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    targets: Tuple[str, ...] = LORA_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def init_lora_params(rng: jax.Array, llm_params: Dict[str, Any],
                     cfg: LoraConfig) -> Dict[str, Any]:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 so the model starts at base."""
    out = {}
    layers = llm_params["layers"]
    for i, name in enumerate(cfg.targets):
        if name not in layers:
            continue
        w = layers[name]  # [L, in, out] array, or a quantized dict
        if isinstance(w, dict):
            q = w["q4"] if "q4" in w else w["q"]
            l, din, dout = q.shape
            if "q4" in w:
                din *= 2  # two nibbles packed per byte along the input dim
            dtype = jnp.bfloat16
        else:
            l, din, dout = w.shape
            dtype = w.dtype
        ka = jax.random.fold_in(rng, i)
        out[name] = {
            "a": (jax.random.normal(ka, (l, din, cfg.r), jnp.float32)
                  / jnp.sqrt(din)).astype(dtype),
            "b": jnp.zeros((l, cfg.r, dout), dtype),
        }
    return out


def merge(llm_params: Dict[str, Any], lora_params: Dict[str, Any],
          cfg: LoraConfig) -> Dict[str, Any]:
    """Functional merge: returns a params tree with W + (A@B)*scale.
    Differentiable w.r.t. the LoRA factors.

    Quantized base weights (int8/int4 dicts) are NOT densified — the LoRA
    factors ride along as a low-rank bypass evaluated at matmul time
    (y = x@W_q + (x@A)@B * scale, see matmul_maybe_quantized), so a frozen
    int4 7B base + bf16 adapters trains in ~4.5 GB: the TPU equivalent of
    the reference's QLoRA-ish bitsandbytes + ZeRO-2-offload recipe
    (train.py:1040-1056, scripts/zero2_offload.json)."""
    layers = dict(llm_params["layers"])
    for name, ab in lora_params.items():
        w = layers[name]
        if isinstance(w, dict):
            # scale shaped [L, 1, 1] so the per-layer lax.scan can slice it
            scale = jnp.full((ab["a"].shape[0], 1, 1), cfg.scaling, jnp.float32)
            layers[name] = {**w, "lora_a": ab["a"], "lora_b": ab["b"],
                            "lora_scale": scale}
            continue
        delta = jnp.einsum("lir,lro->lio", ab["a"].astype(jnp.float32),
                           ab["b"].astype(jnp.float32)) * cfg.scaling
        layers[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return {**llm_params, "layers": layers}


def export_hf_lora(lora_params: Dict[str, Any], cfg: LoraConfig) -> Dict[str, Any]:
    """Stacked factors -> peft-style flat state dict (per-layer, transposed
    to torch [out, in] layout) for interchange with the reference loader."""
    import numpy as np

    name_map = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
                "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                "down": "mlp.down_proj"}
    out = {}
    for name, ab in lora_params.items():
        a = np.asarray(ab["a"], np.float32)  # [L, in, r]
        b = np.asarray(ab["b"], np.float32)  # [L, r, out]
        for i in range(a.shape[0]):
            stem = f"base_model.model.model.layers.{i}.{name_map[name]}"
            out[f"{stem}.lora_A.weight"] = np.ascontiguousarray(a[i].T)  # [r, in]
            out[f"{stem}.lora_B.weight"] = np.ascontiguousarray(b[i].T)  # [out, r]
    return out


def trainable_filter(tune_projector: bool = True, tune_region: bool = True,
                     tune_lora: bool = True, tune_base: bool = False):
    """Path-based trainability matching the reference flags
    (train.py:1185-1212): towers always frozen; projector/region/LoRA
    selectable."""

    def f(path: Tuple[str, ...]) -> bool:
        joined = "/".join(str(p) for p in path)
        if "image_tower" in joined or "video_tower" in joined:
            return False
        if joined.startswith("lora"):
            return tune_lora
        if "projector" in joined:
            return tune_projector
        if "region" in joined:
            return tune_region
        if joined.startswith("llm"):
            return tune_base
        return tune_base

    return f
