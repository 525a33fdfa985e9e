"""HF checkpoint loading for the Llama decoder.

Rebuilds the reference loader pipeline (reference: vitron/model/builder.py:27-171):
base Llama/Vicuna weights from safetensors or torch .bin shards, optional
LoRA adapter **merged at load time** (the reference merges via
peft `merge_and_unload`, builder.py:81-85), and the `non_lora_trainables.bin`
side-file carrying mm_projector / region_extractor weights (builder.py:63-79).

All conversion is numpy-only on host; arrays land on device via the caller's
sharding rules (vitron_tpu.core.mesh.shard_params).
"""
from __future__ import annotations

import json
import pathlib
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from vitron_tpu.models.llm.llama import LlamaConfig


def _np(x) -> np.ndarray:
    """torch tensor / numpy -> numpy float32 (bf16-safe)."""
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope
    x = x.detach().cpu()
    if str(x.dtype) == "torch.bfloat16":
        x = x.float()
    return x.numpy()


def convert_hf_llama(state_dict: Mapping[str, Any], cfg: LlamaConfig) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict -> stacked-layer param tree.

    HF linear weights are [out, in]; ours are [in, out] (x @ w).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    l = cfg.num_layers

    def t(name):  # transpose projection
        return np.ascontiguousarray(sd[name].T)

    def stack(fmt, transpose=True):
        mats = []
        for i in range(l):
            w = sd[fmt.format(i)]
            mats.append(np.ascontiguousarray(w.T) if transpose else w)
        return np.stack(mats)

    params = {
        "embed": sd["model.embed_tokens.weight"],
        "layers": {
            "attn_norm": stack("model.layers.{}.input_layernorm.weight", transpose=False),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight", transpose=False),
            "gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "up": stack("model.layers.{}.mlp.up_proj.weight"),
            "down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": sd["model.norm.weight"],
        "lm_head": np.ascontiguousarray(sd["lm_head.weight"].T),
    }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32).astype(_npdt(cfg.param_dtype)), params)


def _npdt(jdt):
    import jax.numpy as jnp

    return np.dtype(jnp.dtype(jdt).name) if jnp.dtype(jdt) != jnp.bfloat16 else jnp.bfloat16


def merge_lora(
    state_dict: Dict[str, np.ndarray],
    lora_state: Mapping[str, Any],
    scaling: Optional[float] = None,
    r: Optional[int] = None,
    alpha: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Merge peft LoRA A/B pairs into a flat HF state dict, in place.

    peft keys look like
      base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight  [r, in]
      base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight  [out, r]
    merged:  W += (B @ A) * (alpha / r)     (reference merge_and_unload,
    builder.py:85; finetune r=128 alpha=256, finetune_lora.sh:11)
    """
    if scaling is None:
        scaling = (alpha / r) if (alpha and r) else 1.0
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in lora_state.items():
        m = re.match(r"(?:base_model\.model\.)?(.*)\.lora_(A|B)\.(?:default\.)?weight", k)
        if not m:
            continue
        base, ab = m.group(1), m.group(2)
        pairs.setdefault(base, {})[ab] = _np(v)
    for base, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        target = base + ".weight"
        if target not in state_dict:
            # peft prefixes with model.; try stripping leading 'model.'
            alt = target.split(".", 1)[-1]
            if alt in state_dict:
                target = alt
            else:
                continue
        delta = (ab["B"].astype(np.float32) @ ab["A"].astype(np.float32)) * scaling
        state_dict[target] = (state_dict[target].astype(np.float32) + delta).astype(
            state_dict[target].dtype
        )
    return state_dict


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a checkpoint dir into one dict."""
    from safetensors import safe_open

    path = pathlib.Path(path)
    out: Dict[str, np.ndarray] = {}
    index = path / "model.safetensors.index.json"
    files = (
        sorted({path / v for v in json.loads(index.read_text())["weight_map"].values()})
        if index.exists()
        else sorted(path.glob("*.safetensors"))
    )
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-serialized .bin (non_lora_trainables / legacy shards)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def _quantize_host_one(w: np.ndarray, bits: int) -> Dict[str, np.ndarray]:
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=-2, keepdims=True), 1e-8)
    if bits == 8:
        s = amax / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return {"q": q, "s": s.astype(np.float32)}
    s = amax / 7.0
    q = np.clip(np.round(w / s), -7, 7).astype(np.int8)
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = ((hi.astype(np.uint8) & 0xF) << 4 | (lo.astype(np.uint8) & 0xF)).astype(np.int8)
    return {"q4": packed, "s": s.astype(np.float32)}


def quantize_host(params: Dict[str, Any], bits: int = 8,
                  targets=("wq", "wk", "wv", "wo", "gate", "up", "down"),
                  head: bool = True) -> Dict[str, Any]:
    """Host-side (numpy) weight-only quantization — the production path for
    full-size models: converting on device needs the bf16 and int8 copies
    resident simultaneously (> one v5e chip's HBM for 7B). head=True also
    quantizes lm_head — its bf16 read is 8% of a 7B int4 decode step's HBM
    traffic, worth ~3% decode throughput (docs/PERF.md attribution)."""
    layers = dict(params["layers"])
    for t in targets:
        if t in layers:
            layers[t] = _quantize_host_one(layers[t], bits)
    out = {**params, "layers": layers}
    if head and "lm_head" in out:
        out["lm_head"] = _quantize_host_one(out["lm_head"], bits)
    return out


def load_pretrained_llama(
    base_path: str,
    cfg: LlamaConfig,
    lora_path: Optional[str] = None,
    quantize: str = "",
) -> Dict[str, Any]:
    """Full loader: base + optional LoRA merge (+ optional host int8/int4
    weight-only quantization) -> device-ready param tree."""
    sd = load_safetensors_dir(base_path)
    if not sd:
        # legacy torch shards
        for f in sorted(pathlib.Path(base_path).glob("pytorch_model*.bin")):
            sd.update(load_torch_bin(str(f)))
    if "lm_head.weight" not in sd and "model.embed_tokens.weight" in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]  # tied embeddings
    if lora_path:
        lp = pathlib.Path(lora_path)
        cfg_file = lp / "adapter_config.json"
        r = alpha = None
        if cfg_file.exists():
            acfg = json.loads(cfg_file.read_text())
            r, alpha = acfg.get("r"), acfg.get("lora_alpha")
        lora_sd: Dict[str, np.ndarray] = {}
        for f in list(lp.glob("adapter_model.safetensors")):
            from safetensors import safe_open

            with safe_open(str(f), framework="np") as sf:
                for k in sf.keys():
                    lora_sd[k] = sf.get_tensor(k)
        for f in list(lp.glob("adapter_model.bin")):
            lora_sd.update(load_torch_bin(str(f)))
        merge_lora(sd, lora_sd, r=r, alpha=alpha)
    params = convert_hf_llama(sd, cfg)
    if quantize in ("int8", "int4"):
        params = quantize_host(params, bits=8 if quantize == "int8" else 4)
    return params
