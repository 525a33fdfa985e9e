"""Unified configuration tree.

The reference juggles five config systems at once (SURVEY §5: HF dataclass
args, argparse, OmegaConf-pickled-in-.pth, yaml+Registry, DeepSpeed JSON).
Here every component already takes a frozen dataclass; this module adds one
top-level tree + dict/JSON round-tripping so deployments are a single file.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional, Type, TypeVar

T = TypeVar("T")


def to_dict(cfg: Any) -> Any:
    """Frozen-dataclass tree -> plain dicts (jnp dtypes -> str)."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name))
                for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if hasattr(cfg, "dtype") or type(cfg).__module__.startswith("jax"):
        return str(cfg)
    if isinstance(cfg, type):
        return getattr(cfg, "__name__", str(cfg))
    return cfg


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Plain dicts -> dataclass tree; nested dataclass fields recurse;
    unknown keys are rejected loudly."""
    import jax.numpy as jnp

    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"{cls.__name__}: unknown config keys {sorted(unknown)}")
    kwargs = {}
    for name, value in data.items():
        f = fields[name]
        ftype = f.type if isinstance(f.type, type) else None
        default = getattr(cls, name, None)
        if isinstance(value, dict):
            # resolve nested dataclass type from the field default
            d = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default  # type: ignore
            if dataclasses.is_dataclass(d):
                kwargs[name] = from_dict(type(d), value)
                continue
        if isinstance(value, str) and value in ("bfloat16", "float32", "float16"):
            kwargs[name] = getattr(jnp, value)
            continue
        if isinstance(value, list):
            value = tuple(value)
        kwargs[name] = value
    return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    """Top-level deployment config: which backends to enable and where the
    checkpoints live."""

    base_model: str = ""
    lora_path: str = ""
    seem_checkpoint: str = ""
    gligen_gen_checkpoint: str = ""
    gligen_inpaint_checkpoint: str = ""
    sd_vae_checkpoint: str = ""
    clip_text_checkpoint: str = ""
    controlnet_checkpoint: str = ""
    t2v_checkpoint: str = ""
    i2v_checkpoint: str = ""
    conv_template: str = "llava_v1"
    mesh_shape: Optional[Dict[str, int]] = None
    quantize_llm: str = ""           # "" | "int8" | "int4"
    enable: tuple = ("A", "B", "C", "D", "E", "F", "G")

    @staticmethod
    def load(path: str) -> "SystemConfig":
        return from_dict(SystemConfig, json.loads(pathlib.Path(path).read_text()))

    def save(self, path: str) -> None:
        pathlib.Path(path).write_text(json.dumps(to_dict(self), indent=2))
