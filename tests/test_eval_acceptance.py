"""File-level acceptance: eval_suite --weights on a synthetic checkpoint dir.

Every prior loader test fed converter functions synthetic DICTS; this one
goes through the DISK path the acceptance run uses — real HF-format
safetensors written by transformers' own save_pretrained, a peft-style LoRA
adapter, and non_lora_trainables adapters — so a key-schema drift in any
loader breaks here before it breaks on real weights (VERDICT r1 weak #4)."""
import json

import numpy as np
import pytest

import jax

from vitron_tpu.apps import eval_suite

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class _StubTok:
    bos_token_id, eos_token_id = 1, 2

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    w = tmp_path_factory.mktemp("weights")

    # ---- tiny HF llama written by transformers itself
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.save_pretrained(w / "vicuna-7b", safe_serialization=True)

    # ---- peft-style LoRA adapter on q_proj of layer 0 + adapters
    lora = w / "vitron_lora"
    lora.mkdir()
    (lora / "adapter_config.json").write_text(json.dumps(
        {"r": 2, "lora_alpha": 4}))
    from safetensors.numpy import save_file

    rs = np.random.RandomState(0)
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            rs.randn(2, 64).astype(np.float32) * 0.01,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            rs.randn(64, 2).astype(np.float32) * 0.01,
    }, str(lora / "adapter_model.safetensors"))

    # ---- non_lora_trainables: projector + region extractor (torch .bin,
    # the reference's builder.py:63-79 format)
    vision_h, llm_h = 32, 64
    nl = {
        "model.mm_projector.0.weight": torch.randn(llm_h, vision_h) * 0.02,
        "model.mm_projector.0.bias": torch.zeros(llm_h),
        "model.mm_projector.2.weight": torch.randn(llm_h, llm_h) * 0.02,
        "model.mm_projector.2.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.0.weight": torch.randn(llm_h, vision_h) * 0.02,
        "model.region_extractor.region_linear.layers.0.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.1.weight": torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.region_linear.layers.1.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.2.weight": torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.region_linear.layers.2.bias": torch.zeros(llm_h),
        "model.region_extractor.loc_encoder.loc_encoder.0.weight": torch.randn(llm_h, 4) * 0.02,
        "model.region_extractor.loc_encoder.loc_encoder.0.bias": torch.zeros(llm_h),
        "model.region_extractor.loc_encoder.loc_encoder.2.weight": torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.loc_encoder.loc_encoder.2.bias": torch.zeros(llm_h),
    }
    torch.save(nl, lora / "non_lora_trainables.bin")

    # ---- tiny HF CLIP vision tower written by transformers itself
    clip_cfg = transformers.CLIPVisionConfig(
        hidden_size=vision_h, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=7)
    torch.manual_seed(1)
    tower = transformers.CLIPVisionModel(clip_cfg)
    tower.save_pretrained(w / "clip_vit_l14", safe_serialization=False)
    return w


def test_acceptance_suite_from_disk(weights_dir, monkeypatch):
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        lambda *a, **k: _StubTok())
    report = eval_suite.run_acceptance_suite(str(weights_dir), seed=0)

    qa = report["1_image_qa"]
    assert "reply_sha16" in qa, qa
    assert len(qa["reply"]) > 0
    # deterministic: re-running produces the same acceptance hash
    report2 = eval_suite.run_acceptance_suite(str(weights_dir), seed=0)
    assert report2["1_image_qa"]["reply_sha16"] == qa["reply_sha16"]
    # absent components are reported, not fatal
    assert report["2_seem_text_seg"]["status"] == "missing"
    assert report["3_gligen"]["status"] == "missing"
    assert report["4_i2vgen_unet"]["status"] == "missing"


def test_acceptance_lora_changes_output(weights_dir, monkeypatch):
    """The LoRA merge must actually alter the loaded weights (a silently
    skipped adapter would still produce a valid-looking report)."""
    from vitron_tpu.models.llm import llama, loader

    base = weights_dir / "vicuna-7b"
    cfg = eval_suite._llama_cfg_from_hf(base)
    plain = loader.load_pretrained_llama(str(base), cfg)
    merged = loader.load_pretrained_llama(
        str(base), cfg, lora_path=str(weights_dir / "vitron_lora"))
    dq = np.abs(np.asarray(plain["layers"]["wq"], np.float32)
                - np.asarray(merged["layers"]["wq"], np.float32)).max()
    assert dq > 0, "LoRA merge did not modify q_proj"
    dk = np.abs(np.asarray(plain["layers"]["wk"], np.float32)
                - np.asarray(merged["layers"]["wk"], np.float32)).max()
    assert dk == 0, "LoRA merge touched an un-adapted weight"
