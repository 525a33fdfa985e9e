"""Training: preprocessing parity semantics, LoRA math, end-to-end fit."""
import json
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vitron_tpu.models import vitron_model
from vitron_tpu.models.llm import llama
from vitron_tpu.train import data as data_mod
from vitron_tpu.train import lora as lora_mod
from vitron_tpu.train.trainer import TrainConfig, Trainer


class WordTok:
    bos_token_id = 1

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r


def test_preprocess_multimodal_video_expansion():
    src = [[{"from": "human", "value": "<video>\nwhat happens?"},
            {"from": "gpt", "value": "a dog runs"}]]
    out = data_mod.preprocess_multimodal(src, num_frames=8)
    assert out[0][0]["value"].count("<image>") == 8
    assert "<video>" not in out[0][0]["value"]
    # original untouched (deepcopy)
    assert "<video>" in src[0][0]["value"]


def test_preprocess_v1_masks_non_assistant():
    tok = WordTok()
    src = [[{"from": "human", "value": "<image>\nwhat is this?"},
            {"from": "gpt", "value": "a cat"}]]
    src = data_mod.preprocess_multimodal(src, num_frames=8)
    out = data_mod.preprocess_v1(src, tok, has_image=True)
    ids = out["input_ids"][0]
    labels = out["labels"][0]
    assert len(ids) == len(labels)
    # sentinel tokens present and masked
    assert IMAGE_TOKEN_INDEX in ids
    for t, l in zip(ids, labels):
        if t == IMAGE_TOKEN_INDEX:
            assert l == IGNORE_INDEX
    # some assistant tokens remain unmasked
    assert any(l != IGNORE_INDEX for l in labels)
    # the masked prefix covers the system prompt + question
    first_live = next(i for i, l in enumerate(labels) if l != IGNORE_INDEX)
    assert first_live > len(ids) // 2


def test_lora_merge_zero_b_is_identity():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_mod.LoraConfig(r=4, alpha=8)
    lp = lora_mod.init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    merged = lora_mod.merge(params, lp, lcfg)
    np.testing.assert_allclose(np.asarray(merged["layers"]["wq"]),
                               np.asarray(params["layers"]["wq"]))


def test_lora_export_roundtrip():
    """export -> reference-style merge == functional merge."""
    from vitron_tpu.models.llm.loader import merge_lora

    cfg = llama.LlamaConfig.tiny(num_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_mod.LoraConfig(r=4, alpha=8, targets=("wq",))
    lp = lora_mod.init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    lp["wq"]["b"] = jax.random.normal(jax.random.PRNGKey(2), lp["wq"]["b"].shape) * 0.1
    merged = lora_mod.merge(params, lp, lcfg)

    sd = {"model.layers.0.self_attn.q_proj.weight":
          np.asarray(params["layers"]["wq"][0]).T.copy()}
    hf = lora_mod.export_hf_lora(lp, lcfg)
    merge_lora(sd, hf, r=4, alpha=8)
    want = sd["model.layers.0.self_attn.q_proj.weight"].T
    np.testing.assert_allclose(np.asarray(merged["layers"]["wq"][0]), want,
                               rtol=1e-5, atol=1e-5)


def test_modality_grouped_batches_pure():
    lengths = list(range(20))
    flags = [i % 2 == 0 for i in range(20)]
    import random

    order = data_mod.modality_grouped_indices(lengths, flags, 4, random.Random(0))
    for i in range(0, len(order) - 3, 4):
        batch_flags = {flags[j] for j in order[i : i + 4]}
        assert len(batch_flags) == 1  # no mixed-modality batch


def test_trainer_end_to_end(tmp_path):
    """Three steps of LoRA fine-tuning on a tiny multimodal dataset:
    loss finite + decreasing trend, artifacts saved."""
    items = []
    for i in range(8):
        items.append({
            "conversations": [
                {"from": "human", "value": "<image>\nwhat color is this?"},
                {"from": "gpt", "value": f"it is color number {i}"},
            ],
            "image": f"img_{i}.png",
        })
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(items))

    cfg = vitron_model.VitronConfig.tiny()
    base = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    ds = data_mod.SupervisedDataset(str(data_path), WordTok(),
                                    model_max_length=128)
    tc = TrainConfig(batch_size=2, num_epochs=1, pad_len=128, save_steps=100,
                     learning_rate=1e-3,
                     lora=lora_mod.LoraConfig(r=2, alpha=4))
    tr = Trainer(cfg, tc, base, str(tmp_path / "out"))

    def media_loader(kind, path):
        return np.random.RandomState(abs(hash(path)) % 1000).rand(28, 28, 3).astype(np.float32)

    losses = tr.fit(ds, media_loader=media_loader, total_steps=3, image_len=16)
    assert len(losses) == 3
    assert all(np.isfinite(losses))
    assert losses[0] > 0.5  # labels must survive the splice (pad_len budget)
    assert (tmp_path / "out" / "adapter_model.npz").exists()
    assert (tmp_path / "out" / "non_lora_trainables.npz").exists()
    cfg_json = json.loads((tmp_path / "out" / "adapter_config.json").read_text())
    assert cfg_json["r"] == 2


def test_qlora_train_quantized_base(tmp_path):
    """LoRA fine-tuning over a FROZEN QUANTIZED base (int8 and int4): the
    adapters ride as a low-rank bypass at matmul time (lora.merge keeps the
    base packed). Loss finite; LoRA factors actually receive gradients."""
    from vitron_tpu.kernels.quantization import quantize_llama

    items = [{
        "conversations": [
            {"from": "human", "value": "<image>\nwhat color is this?"},
            {"from": "gpt", "value": f"it is color number {i}"},
        ],
        "image": f"img_{i}.png",
    } for i in range(4)]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(items))

    cfg = vitron_model.VitronConfig.tiny()

    def media_loader(kind, path):
        return np.random.RandomState(abs(hash(path)) % 1000).rand(28, 28, 3).astype(np.float32)

    for bits in (8, 4):
        base = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
        base = dict(base)
        base["llm"] = quantize_llama(base["llm"], bits=bits)
        ds = data_mod.SupervisedDataset(str(data_path), WordTok(),
                                        model_max_length=128)
        tc = TrainConfig(batch_size=2, num_epochs=1, pad_len=128,
                         save_steps=100, learning_rate=1e-2,
                         lora=lora_mod.LoraConfig(r=2, alpha=4))
        tr = Trainer(cfg, tc, base, str(tmp_path / f"out{bits}"))
        losses = tr.fit(ds, media_loader=media_loader, total_steps=2,
                        image_len=16)
        assert all(np.isfinite(losses)), (bits, losses)
        assert losses[0] > 0.5, (bits, losses)
        a = np.asarray(tr.trainable["lora"]["wq"]["a"])
        assert np.abs(a).max() > 0, f"int{bits}: LoRA A never updated"


def test_qlora_merge_matches_dense_merge():
    """Quantized-base bypass merge == dense merge on the dequantized base
    (up to quantization error of the base itself)."""
    import jax.numpy as jnp

    from vitron_tpu.kernels.quantization import (
        dequantize, matmul_maybe_quantized, quantize_llama)
    from vitron_tpu.models.llm import llama

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_mod.LoraConfig(r=2, alpha=4)
    lora = lora_mod.init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    # randomize B so the bypass is nonzero
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    dense = lora_mod.merge(params, lora, lcfg)
    qbase = quantize_llama(params, bits=8)
    qmerged = lora_mod.merge(qbase, lora, lcfg)

    x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.hidden_size))
    wd = dense["layers"]["wq"][0]
    wq = jax.tree.map(lambda v: v[0], qmerged["layers"]["wq"])
    got = matmul_maybe_quantized(x, wq)
    want = x @ wd
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.05, rel


def test_adafactor_optimizer(tmp_path):
    """TrainConfig(optimizer='adafactor') — the i2vgen fine-tune optimizer
    (reference modules/i2vgen-xl/utils/optim/adafactor.py, selected by the
    train configs) — takes steps with finite decreasing-ish loss through
    the same LoRA trainer."""
    items = [{
        "conversations": [
            {"from": "human", "value": "<image>\nwhat color is this?"},
            {"from": "gpt", "value": f"it is color number {i}"},
        ],
        "image": f"img_{i}.png",
    } for i in range(4)]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(items))

    cfg = vitron_model.VitronConfig.tiny()
    base = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    ds = data_mod.SupervisedDataset(str(data_path), WordTok(),
                                    model_max_length=128)
    tc = TrainConfig(batch_size=2, num_epochs=1, pad_len=128, save_steps=100,
                     learning_rate=1e-2, optimizer="adafactor",
                     lora=lora_mod.LoraConfig(r=2, alpha=4))
    tr = Trainer(cfg, tc, base, str(tmp_path / "out_adafactor"))

    def media_loader(kind, path):
        return np.random.RandomState(abs(hash(path)) % 1000).rand(
            28, 28, 3).astype(np.float32)

    losses = tr.fit(ds, media_loader=media_loader, total_steps=2, image_len=16)
    assert len(losses) == 2 and all(np.isfinite(losses))
