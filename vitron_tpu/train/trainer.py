"""LoRA fine-tuning trainer with GSPMD sharding and Orbax checkpoints.

Rebuilds the reference training stack (reference: vitron/train/train.py:
1029-1264 + llava_trainer.py) the TPU way:

- trainable params live in their OWN pytree ({lora, projector, region}) —
  grads and optimizer state exist only for them, which is what DeepSpeed
  ZeRO-2 + CPU offload approximates by sharding full-model Adam states
  (scripts/zero2_offload.json:34-43);
- the frozen base (LLM + towers) stays bf16, sharded over the mesh by the
  model sharding rules; XLA inserts all collectives;
- per-group learning rates replicate mm_projector_lr
  (llava_trainer.py:184-271);
- Orbax checkpointing with save_total_limit rotation; final save splits
  LoRA factors (HF-peft-compatible export) from `non_lora_trainables`
  (projector/region), matching the reference artifact layout
  (train.py:1251-1264) so either runtime can load either's output.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import random
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitron_tpu.models import vitron_model
from vitron_tpu.train import data as data_mod
from vitron_tpu.train import lora as lora_mod
from vitron_tpu.train.losses import causal_lm_loss

IGNORE_INDEX_VALUE = -100


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4           # finetune_lora.sh:27
    projector_lr: Optional[float] = None  # mm_projector_lr group
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    batch_size: int = 16                  # finetune_lora.sh:29
    num_epochs: int = 1
    save_steps: int = 500                 # finetune_lora.sh:35
    save_total_limit: int = 1
    warmup_ratio: float = 0.03            # finetune_lora.sh:40
    optimizer: str = "adamw"              # "adamw" | "adafactor" (i2vgen uses
                                          # Adafactor, utils/optim/adafactor.py)
    seed: int = 0
    pad_len: int = 2048
    tune_projector: bool = True
    tune_region: bool = True
    lora: lora_mod.LoraConfig = dataclasses.field(default_factory=lora_mod.LoraConfig)


def make_lora_train_step(cfg: vitron_model.VitronConfig, train_cfg: TrainConfig,
                         optimizer):
    """(base, trainable, opt_state, batch) -> (trainable, opt_state, loss)."""

    def loss_fn(trainable, base, batch):
        llm = lora_mod.merge(base["llm"], trainable["lora"], train_cfg.lora)
        params = {**base, "llm": llm}
        if "projector" in trainable:
            params = {**params, "projector": trainable["projector"]}
        if "region" in trainable:
            params = {**params, "region": trainable["region"]}
        logits, _ = vitron_model.forward(
            params, cfg,
            batch["token_ids"], batch["media_idx"], batch["use_media"],
            batch["positions"], batch["attn_mask"],
            images=batch.get("images"), videos=batch.get("videos"),
            block_perm=batch.get("block_perm"),
            region_boxes=batch.get("region_boxes"),
            region_block_idx=batch.get("region_block_idx"))
        return causal_lm_loss(logits, batch["labels"])

    def step(trainable, base, opt_state, batch):
        from vitron_tpu.kernels.quantization import promote_int4

        # frozen int4 base: expand packed nibbles to native s4 once per step
        # inside the jitted program (fuses into the dots; ~40 ms at 7B,
        # small next to a full fwd+bwd). a8=False: the W4A8 integer-dot
        # serving path quantizes activations, which would perturb gradients
        base = promote_int4(base, a8=False)
        loss, grads = jax.value_and_grad(loss_fn)(trainable, base, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return step


def make_optimizer(train_cfg: TrainConfig, total_steps: int):
    """AdamW + cosine schedule with warmup; separate LR for the projector
    group when projector_lr is set (llava_trainer.py:184-271)."""
    warmup = max(int(train_cfg.warmup_ratio * total_steps), 1)

    def sched(base_lr):
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, max(total_steps, warmup + 1))

    def make(lr):
        if train_cfg.optimizer == "adafactor":
            inner = optax.adafactor(sched(lr))
        else:
            inner = optax.adamw(sched(lr), weight_decay=train_cfg.weight_decay)
        return optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip), inner)

    if train_cfg.projector_lr is None:
        return make(train_cfg.learning_rate)

    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: "projector"
            if any(getattr(k, "key", None) == "projector" for k in kp) else "default",
            tree)

    return optax.multi_transform(
        {"default": make(train_cfg.learning_rate),
         "projector": make(train_cfg.projector_lr)},
        label_fn)


class Trainer:
    def __init__(self, model_cfg: vitron_model.VitronConfig,
                 train_cfg: TrainConfig, base_params: Dict[str, Any],
                 out_dir: str, rng: Optional[jax.Array] = None):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.base_params = base_params
        self.out_dir = pathlib.Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)

        self.trainable: Dict[str, Any] = {
            "lora": lora_mod.init_lora_params(rng, base_params["llm"], train_cfg.lora),
        }
        if train_cfg.tune_projector:
            self.trainable["projector"] = base_params["projector"]
        if train_cfg.tune_region:
            self.trainable["region"] = base_params["region"]

        self.step_count = 0
        self._ckpts: List[pathlib.Path] = []

    def fit(self, dataset: data_mod.SupervisedDataset, media_loader=None,
            total_steps: Optional[int] = None, log_every: int = 10,
            image_len: Optional[int] = None):
        cfg, tc = self.model_cfg, self.train_cfg
        lengths = dataset.lengths()
        flags = dataset.modality_flags()
        gen = random.Random(tc.seed)
        steps_per_epoch = max(len(dataset) // tc.batch_size, 1)
        total = total_steps or steps_per_epoch * tc.num_epochs

        optimizer = make_optimizer(tc, total)
        opt_state = jax.jit(optimizer.init)(self.trainable)
        step_fn = jax.jit(make_lora_train_step(cfg, tc, optimizer),
                          donate_argnums=(0, 2))

        losses = []
        for epoch in range(tc.num_epochs):
            order = data_mod.modality_grouped_indices(lengths, flags, tc.batch_size, gen)
            for bi in range(0, len(order) - tc.batch_size + 1, tc.batch_size):
                idxs = order[bi : bi + tc.batch_size]
                batch = self._build_batch(dataset, idxs, media_loader, image_len)
                if batch is None:
                    continue
                self.trainable, opt_state, loss = step_fn(
                    self.trainable, self.base_params, opt_state, batch)
                self.step_count += 1
                losses.append(float(loss))
                if self.step_count % log_every == 0:
                    print(f"step {self.step_count}/{total} loss {np.mean(losses[-log_every:]):.4f}")
                if self.step_count % tc.save_steps == 0:
                    self.save_checkpoint(opt_state)
                if self.step_count >= total:
                    self.save_final()
                    return losses
        self.save_final()
        return losses

    def _build_batch(self, dataset, idxs, media_loader, image_len):
        from vitron_tpu.runtime.engine import MediaItem, prepare_batch

        rows, labels, media = [], [], []
        for i in idxs:
            s = dataset[i]
            rows.append(s.input_ids)
            labels.append(s.labels)
            for kind, path in zip(s.media_kinds, s.media_paths):
                if media_loader is None:
                    return None
                media.append(MediaItem(kind, media_loader(kind, path)))
        plan, images, videos, perm = prepare_batch(
            rows, media, pad_to=self.train_cfg.pad_len, labels=labels,
            image_len=image_len or self.model_cfg.image_tower.num_patches)
        live = int((plan.labels != IGNORE_INDEX_VALUE).sum())
        if live == 0:
            print("WARNING: batch has zero live labels — pad_len is likely "
                  "too small for the spliced sequence (media rows count "
                  "toward the budget); loss will be 0")
        batch = {
            "token_ids": jnp.asarray(plan.token_ids),
            "media_idx": jnp.asarray(plan.media_idx),
            "use_media": jnp.asarray(plan.use_media),
            "positions": jnp.asarray(plan.position_ids),
            "attn_mask": jnp.asarray(plan.attention_mask),
            "labels": jnp.asarray(plan.labels),
        }
        if images is not None:
            batch["images"] = jnp.asarray(images)
        if videos is not None:
            batch["videos"] = jnp.asarray(videos)
        if perm is not None:
            batch["block_perm"] = jnp.asarray(perm)
        return batch

    # ------------------------------------------------------------- ckpt

    def save_checkpoint(self, opt_state=None):
        """Orbax step checkpoint with save_total_limit rotation
        (finetune_lora.sh:35-37)."""
        import orbax.checkpoint as ocp

        path = self.out_dir / f"checkpoint-{self.step_count}"
        ckpt = {"trainable": self.trainable, "step": self.step_count}
        if opt_state is not None:
            ckpt["opt_state"] = opt_state
        ocp.PyTreeCheckpointer().save(path.absolute(), ckpt, force=True)
        self._ckpts.append(path)
        while len(self._ckpts) > self.train_cfg.save_total_limit:
            old = self._ckpts.pop(0)
            import shutil

            shutil.rmtree(old, ignore_errors=True)

    def resume(self, path: str):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer().restore(pathlib.Path(path).absolute())
        self.trainable = ckpt["trainable"]
        self.step_count = int(ckpt["step"])
        return ckpt.get("opt_state")

    def save_final(self):
        """Reference-compatible artifact split (train.py:1251-1264):
        adapter_model (LoRA, peft naming) + non_lora_trainables
        (projector/region)."""
        lora_sd = lora_mod.export_hf_lora(self.trainable["lora"], self.train_cfg.lora)
        np.savez(self.out_dir / "adapter_model.npz", **lora_sd)
        (self.out_dir / "adapter_config.json").write_text(json.dumps({
            "r": self.train_cfg.lora.r, "lora_alpha": self.train_cfg.lora.alpha,
            "target_modules": list(self.train_cfg.lora.targets),
        }))
        non_lora = {}
        for key in ("projector", "region"):
            if key in self.trainable:
                flat = jax.tree_util.tree_flatten_with_path(self.trainable[key])[0]
                for kp, v in flat:
                    name = key + "." + ".".join(str(getattr(k, "key", k)) for k in kp)
                    non_lora[name] = np.asarray(v)
        np.savez(self.out_dir / "non_lora_trainables.npz", **non_lora)
