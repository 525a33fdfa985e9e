"""Synthetic checkpoint fabricator for the acceptance-manifest dry run.

Builds a --weights directory covering EVERY row of the acceptance manifest
(vitron_tpu/apps/eval_suite.py ACCEPTANCE_MANIFEST) so a host with no
released weights can still exercise the full disk -> converter -> task ->
pass/fail pipeline:

    python -m tests.synthetic_weights /tmp/synth --geometry tiny
    python -m vitron_tpu.apps.eval_suite --cpu --weights /tmp/synth \
        --geometry tiny

HF-format components (llama, CLIP towers, LoRA) are written by
transformers/peft-layout code itself; reference-format components (SEEM,
GLIGEN bundle, NLA atlases, video UNets) are fabricated by constructing
the VENDORED reference torch modules (the same constructions the parity
tests use) and saving their state dicts — so a key-schema drift in any
converter fails the dry run exactly as it would fail on real weights.

--geometry real writes released-checkpoint shapes for the HF components
(vicuna-7b, ViT-L/14): ~26 GB of f32 llama on disk, minutes to generate,
and the QA row becomes a multi-minute CPU forward — a dress rehearsal for
a weights-present host, not a CI test. NLA atlases are ALWAYS at the real
released geometry (they are small fixed MLPs).
"""
from __future__ import annotations

import json
import pathlib
import sys


def build_llama_lora_clip(w: pathlib.Path, geometry: str) -> None:
    import numpy as np
    import torch
    import transformers
    from safetensors.numpy import save_file

    if geometry == "real":
        hf_cfg = transformers.LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=4096,
            tie_word_embeddings=False)
        vision_h, llm_h, clip_layers, clip_img, clip_patch, clip_ff = (
            1024, 4096, 24, 224, 14, 4096)
    else:
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=128,
            tie_word_embeddings=False)
        vision_h, llm_h, clip_layers, clip_img, clip_patch, clip_ff = (
            32, 64, 3, 28, 7, 64)

    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.save_pretrained(w / "vicuna-7b", safe_serialization=True)
    del model

    # a real on-disk tokenizer so AutoTokenizer.from_pretrained works
    # unattended (the released vicuna ships sentencepiece; a tiny WordLevel
    # with the same special-token ids exercises the same load path)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ("what is in this image video the a of and picture photo shows "
             "scene human assistant ? . , : #").split()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    vocab.update({t: 3 + i for i, t in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>").save_pretrained(w / "vicuna-7b")

    # peft-style LoRA adapter on q_proj of layer 0 + adapter-only weights
    lora = w / "vitron_lora"
    lora.mkdir(exist_ok=True)
    (lora / "adapter_config.json").write_text(json.dumps(
        {"r": 2, "lora_alpha": 4}))
    rs = np.random.RandomState(0)
    h = hf_cfg.hidden_size
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            rs.randn(2, h).astype(np.float32) * 0.01,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            rs.randn(h, 2).astype(np.float32) * 0.01,
    }, str(lora / "adapter_model.safetensors"))
    nl = {
        "model.mm_projector.0.weight": torch.randn(llm_h, vision_h) * 0.02,
        "model.mm_projector.0.bias": torch.zeros(llm_h),
        "model.mm_projector.2.weight": torch.randn(llm_h, llm_h) * 0.02,
        "model.mm_projector.2.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.0.weight":
            torch.randn(llm_h, vision_h) * 0.02,
        "model.region_extractor.region_linear.layers.0.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.1.weight":
            torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.region_linear.layers.1.bias": torch.zeros(llm_h),
        "model.region_extractor.region_linear.layers.2.weight":
            torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.region_linear.layers.2.bias": torch.zeros(llm_h),
        "model.region_extractor.loc_encoder.loc_encoder.0.weight":
            torch.randn(llm_h, 4) * 0.02,
        "model.region_extractor.loc_encoder.loc_encoder.0.bias": torch.zeros(llm_h),
        "model.region_extractor.loc_encoder.loc_encoder.2.weight":
            torch.randn(llm_h, llm_h) * 0.02,
        "model.region_extractor.loc_encoder.loc_encoder.2.bias": torch.zeros(llm_h),
    }
    torch.save(nl, lora / "non_lora_trainables.bin")

    clip_cfg = transformers.CLIPVisionConfig(
        hidden_size=vision_h, intermediate_size=clip_ff,
        num_hidden_layers=clip_layers, num_attention_heads=4,
        image_size=clip_img, patch_size=clip_patch)
    torch.manual_seed(1)
    tower = transformers.CLIPVisionModel(clip_cfg)
    tower.save_pretrained(w / "clip_vit_l14", safe_serialization=False)

    # LanguageBind video tower: the same CLIP tower + per-layer temporal
    # attention weights (modeling_video.py:65-85 naming)
    lbv = w / "languagebind_video"
    tower.save_pretrained(lbv, safe_serialization=False)
    sd = torch.load(lbv / "pytorch_model.bin", weights_only=True)
    torch.manual_seed(2)
    num_frames = 8  # ViTConfig default the converter assumes
    for i in range(clip_layers):
        stem = f"vision_model.encoder.layers.{i}"
        sd[f"{stem}.temporal_embedding"] = (
            torch.randn(1, num_frames, vision_h) * 0.02)
        sd[f"{stem}.temporal_layer_norm1.weight"] = torch.ones(vision_h)
        sd[f"{stem}.temporal_layer_norm1.bias"] = torch.zeros(vision_h)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{stem}.temporal_attn.{nm}.weight"] = (
                torch.randn(vision_h, vision_h) * 0.02)
            sd[f"{stem}.temporal_attn.{nm}.bias"] = torch.zeros(vision_h)
    torch.save(sd, lbv / "pytorch_model.bin")


def build_clip_tokenizer(w: pathlib.Path) -> None:
    """Tiny CLIP-tokenizer stand-in (ids < 128 so they fit every tiny text
    encoder's vocab): the assembly loads it with AutoTokenizer for SEEM
    language prompts and the GLIGEN / video-diffusion text encoders."""
    import transformers
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ("a photo of the red cube dog cat running main object person "
             "sky grass blue green sunset beach mountain car tree water "
             "bird flying walking standing sitting woman man child house").split()
    vocab = {"<pad>": 0, "<|startoftext|>": 1, "<|endoftext|>": 2,
             "<unk>": 3}
    vocab.update({t: 4 + i for i, t in enumerate(dict.fromkeys(words))})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>",
        bos_token="<|startoftext|>", eos_token="<|endoftext|>",
    ).save_pretrained(w / "clip_tokenizer")


def _tiny_ldm_vae_sd():
    """Tiny ldm AutoencoderKL state dict (the build_gligen recipe, shared
    so t2v/i2vgen can ship their own vae.pth)."""
    import torch

    from tests import torch_shims
    from tests.conftest import load_reference_package_module

    torch_shims.install()
    vae_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.model")
    torch.manual_seed(3)
    enc = vae_mod.Encoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), dropout=0.0, in_channels=3,
                          resolution=32, z_channels=4, double_z=True)
    dec = vae_mod.Decoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), dropout=0.0, in_channels=3,
                          resolution=32, z_channels=4)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    return sd


def build_video_extras(w: pathlib.Path) -> None:
    """VAE + HF text encoder for the t2v/ and i2vgen/ dirs so the assembly
    can register tasks D and G (the reference's diffusers pipelines bundle
    these; our manifest ships them next to the UNet)."""
    import torch
    import transformers

    for name in ("t2v", "i2vgen"):
        vdir = w / name
        vdir.mkdir(exist_ok=True)
        torch.save(_tiny_ldm_vae_sd(), vdir / "vae.pth")
        # hidden 1024 matches the synthetic UNets' context_dim (the tiny
        # stand-in for open-clip ViT-H text, i2vgen clip_embedder.py)
        torch.manual_seed(4)
        text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
            vocab_size=128, hidden_size=1024, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, hidden_act="quick_gelu"))
        text.save_pretrained(vdir / "text_encoder", safe_serialization=False)


def _install_stablevideo_shims() -> None:
    """Extra shims the vendored StableVideo cldm stack needs on top of
    tests.torch_shims (torchvision.utils, a top-level `ldm` alias for the
    StableVideo ldm tree, pytorch_lightning, omegaconf.ListConfig)."""
    import sys
    import types

    import torch

    from tests import torch_shims

    torch_shims.install()

    def mod(name, **attrs):
        m = types.ModuleType(name)
        m.__dict__.update(attrs)
        sys.modules[name] = m
        return m

    if "torchvision.utils" not in sys.modules:
        u = mod("torchvision.utils", make_grid=lambda *a, **k: None)
        tv = sys.modules.get("torchvision")
        if tv is not None:
            tv.utils = u
    if "ldm" not in sys.modules:
        ldm = mod("ldm")
        ldm.__path__ = [str((pathlib.Path("/root/reference") /
                             "modules/StableVideo/ldm"))]
    if "pytorch_lightning" not in sys.modules:
        pl = mod("pytorch_lightning")
        pl.LightningModule = type("LightningModule", (torch.nn.Module,), {})
        pl.seed_everything = lambda *a, **k: None
        mod("pytorch_lightning.utilities", rank_zero_only=lambda f: f)
        mod("pytorch_lightning.utilities.distributed",
            rank_zero_only=lambda f: f)
        mod("pytorch_lightning.callbacks", Callback=object,
            ModelCheckpoint=object)
    oc = sys.modules.get("omegaconf") or mod("omegaconf")
    if not hasattr(oc, "ListConfig"):
        oc.ListConfig = type("ListConfig", (list,), {})
    if "omegaconf.listconfig" not in sys.modules:
        mod("omegaconf.listconfig", ListConfig=oc.ListConfig)


def build_stablevideo_controlnet(w: pathlib.Path) -> None:
    """Tiny ControlLDM bundles (control_sd15_canny/depth.pth layout:
    control_model.* + model.diffusion_model.* + first_stage_model.* +
    cond_stage_model.transformer.*) from the VENDORED StableVideo cldm/ldm
    modules — key-schema drift in any converter fails the dry run."""
    import torch
    import transformers

    from tests.conftest import load_reference_package_module

    _install_stablevideo_shims()
    sv_unet_mod = load_reference_package_module(
        "modules.StableVideo.ldm.modules.diffusionmodules.openaimodel")
    cldm_mod = load_reference_package_module("modules.StableVideo.cldm.cldm")

    tiny = dict(image_size=8, in_channels=4, model_channels=32,
                out_channels=4, num_res_blocks=1, attention_resolutions=(1, 2),
                channel_mult=(1, 2), num_heads=2, use_spatial_transformer=True,
                transformer_depth=1, context_dim=16, legacy=False)
    torch.manual_seed(5)
    unet = sv_unet_mod.UNetModel(**tiny).eval()
    ctrl_kw = dict(tiny)
    ctrl_kw.pop("out_channels")
    control = cldm_mod.ControlNet(hint_channels=3, **ctrl_kw).eval()
    torch.manual_seed(6)
    text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu")).eval()

    def bundle(with_full_ldm: bool):
        sd = {f"control_model.{k}": v for k, v in control.state_dict().items()}
        if with_full_ldm:
            sd.update({f"model.diffusion_model.{k}": v
                       for k, v in unet.state_dict().items()})
            sd.update({f"first_stage_model.{k}": v
                       for k, v in _tiny_ldm_vae_sd().items()})
            sd.update({f"cond_stage_model.transformer.{k}": v
                       for k, v in text.state_dict().items()})
        return sd

    svdir = w / "stablevideo"
    svdir.mkdir(exist_ok=True)
    torch.save(bundle(True), svdir / "control_sd15_canny.pth")
    torch.save(bundle(False), svdir / "control_sd15_depth.pth")


def build_seem(w: pathlib.Path) -> None:
    """Tiny seem_focall_v1.pt from the vendored reference modules — the
    exact constructions the per-component parity tests use, assembled with
    the real checkpoint's key prefixes."""
    import torch

    from tests import torch_shims
    from tests.conftest import load_reference_package_module

    torch_shims.install()

    sd = {}
    # backbone (test_seem.py::test_focalnet_parity construction)
    focal_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.backbone.focal")
    torch.manual_seed(0)
    backbone = focal_mod.FocalNet(
        patch_size=4, embed_dim=16, depths=(1, 1), mlp_ratio=4.0,
        focal_levels=(2, 2), focal_windows=(3, 3), use_conv_embed=True,
        use_postln=True, use_postln_in_modulation=False,
        scaling_modulator=True, use_layerscale=True,
        out_indices=(0, 1), patch_norm=True, frozen_stages=-1)
    backbone.eval()
    sd.update({f"backbone.{k}": v for k, v in backbone.state_dict().items()})

    # FPN pixel decoder (test_seem.py::test_pixel_decoder_full_parity)
    fpn_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.body.encoder.transformer_encoder_fpn")
    from detectron2.layers import ShapeSpec  # shimmed

    torch.manual_seed(0)
    fpn = fpn_mod.TransformerEncoderPixelDecoder(
        input_shape={"res2": ShapeSpec(channels=16, stride=4),
                     "res3": ShapeSpec(channels=32, stride=8)},
        transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=64, transformer_enc_layers=2,
        transformer_pre_norm=False, conv_dim=32, mask_dim=32, mask_on=True,
        norm="GN")
    fpn.eval()
    sd.update({f"sem_seg_head.pixel_decoder.{k}": v
               for k, v in fpn.state_dict().items()})

    # SEEM decoder (test_seem_decoder_parity.py construction)
    from tests.test_seem_decoder_parity import ATTN_ARCH, TASK_SWITCH, LangStub

    seem_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.body.decoder.seem")
    torch.manual_seed(0)
    t_emb = torch.randn(5, 32)
    t_emb = t_emb / t_emb.norm(dim=-1, keepdim=True)
    decoder = seem_mod.MultiScaleMaskedTransformerDecoder(
        lang_encoder=LangStub(t_emb), in_channels=32, mask_classification=True,
        hidden_dim=32, dim_proj=32, num_queries=7, contxt_len=16, nheads=4,
        dim_feedforward=64, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch=dict(TASK_SWITCH), enforce_input_project=False,
        max_spatial_len=[16, 16, 16], attn_arch=dict(ATTN_ARCH))
    decoder.eval()
    sd.update({f"sem_seg_head.predictor.{k}": v
               for k, v in decoder.state_dict().items()})

    # language encoder (test_seem.py::test_lang_encoder_full_parity)
    lang_mod = load_reference_package_module(
        "modules.SEEM.demo_code.xdecoder.language.LangEncoder.transformer")
    torch.manual_seed(0)
    lang = lang_mod.Transformer(context_length=16, vocab_size=128, width=32,
                                layers=2, heads=4, autogressive=True)
    lang.eval()
    sd.update({f"sem_seg_head.predictor.lang_encoder.lang_encoder.{k}": v
               for k, v in lang.state_dict().items()})
    sd["sem_seg_head.predictor.lang_encoder.lang_proj"] = torch.randn(32, 32) * 0.02
    sd["sem_seg_head.predictor.lang_encoder.logit_scale"] = torch.zeros(())

    torch.save(sd, w / "seem_focall_v1.pt")


def build_gligen(w: pathlib.Path) -> None:
    """Tiny GLIGEN gen + inpaint bundles in the reference .pth layout
    (test_diffusion.py::test_gligen_checkpoint_bundle_roundtrip recipe)."""
    import torch
    import transformers

    from tests import torch_shims
    from tests.conftest import load_reference_package_module

    torch_shims.install()
    openaimodel = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.openaimodel")
    vae_mod = load_reference_package_module(
        "modules.GLIGEN.demo.gligen.ldm.modules.diffusionmodules.model")

    def bundle(in_channels: int):
        torch.manual_seed(0)
        unet = openaimodel.UNetModel(
            image_size=8, in_channels=in_channels, model_channels=32,
            out_channels=4, num_res_blocks=1, attention_resolutions=(1, 2),
            channel_mult=(1, 2), num_heads=2, transformer_depth=1,
            positive_len=16, context_dim=16, fuser_type="gatedSA",
            use_checkpoint=False).eval()
        enc = vae_mod.Encoder(ch=32, out_ch=3, ch_mult=(1, 2),
                              num_res_blocks=1, attn_resolutions=(),
                              dropout=0.0, in_channels=3, resolution=32,
                              z_channels=4, double_z=True)
        dec = vae_mod.Decoder(ch=32, out_ch=3, ch_mult=(1, 2),
                              num_res_blocks=1, attn_resolutions=(),
                              dropout=0.0, in_channels=3, resolution=32,
                              z_channels=4)
        quant = torch.nn.Conv2d(8, 8, 1)
        post_quant = torch.nn.Conv2d(4, 4, 1)
        vae_sd = {}
        vae_sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
        vae_sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
        vae_sd.update({f"quant_conv.{k}": v
                       for k, v in quant.state_dict().items()})
        vae_sd.update({f"post_quant_conv.{k}": v
                       for k, v in post_quant.state_dict().items()})
        text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
            vocab_size=128, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, hidden_act="quick_gelu")).eval()
        return {"model": unet.state_dict(), "autoencoder": vae_sd,
                "text_encoder": {f"transformer.{k}": v
                                 for k, v in text.state_dict().items()}}

    gdir = w / "gligen"
    gdir.mkdir(exist_ok=True)
    torch.save(bundle(4), gdir / "checkpoint_generation_text.pth")
    torch.save(bundle(9), gdir / "checkpoint_inpainting_text.pth")


def build_nla(w: pathlib.Path) -> None:
    """StableVideo NLA atlas checkpoint at the REAL released IMLP geometry
    (atlas_utils.py:26-72) via the vendored IMLP module."""
    import torch

    from tests.conftest import load_reference_package_module

    imlp_mod = load_reference_package_module(
        "modules.StableVideo.stablevideo.implicit_neural_networks")
    torch.manual_seed(0)
    m1 = imlp_mod.IMLP(input_dim=3, output_dim=2, hidden_dim=256,
                       use_positional=False, num_layers=6, skip_layers=[])
    m2 = imlp_mod.IMLP(input_dim=3, output_dim=2, hidden_dim=256,
                       use_positional=False, num_layers=4, skip_layers=[])
    atlas = imlp_mod.IMLP(input_dim=2, output_dim=3, hidden_dim=256,
                          use_positional=True, positional_dim=10,
                          num_layers=8, skip_layers=[4, 7])
    alpha = imlp_mod.IMLP(input_dim=3, output_dim=1, hidden_dim=256,
                          use_positional=True, positional_dim=5,
                          num_layers=8, skip_layers=[])
    vdir = w / "stablevideo" / "demo"
    vdir.mkdir(parents=True, exist_ok=True)
    torch.save({
        "model_F_mapping1_state_dict": m1.state_dict(),
        "model_F_mapping2_state_dict": m2.state_dict(),
        "F_atlas_state_dict": atlas.state_dict(),
        "model_F_alpha_state_dict": alpha.state_dict(),
    }, vdir / "checkpoint")
    (vdir / "config.json").write_text(json.dumps(
        {"resx": 768, "resy": 432, "maximum_number_of_frames": 70}))


def build_video_unets(w: pathlib.Path) -> None:
    """Tiny UNetSD_T2VBase / UNetSD_I2VGen .pth files from the vendored
    modules (test_unet_sd_video_parity.py TINY construction)."""
    import torch

    from tests import torch_shims
    from tests.conftest import load_reference_package_module

    torch_shims.install()
    torch_shims.install_i2vgen()
    torch.Tensor.cuda = lambda self, *a, **k: self

    tiny = dict(in_dim=4, dim=32, y_dim=16, context_dim=1024, out_dim=4,
                num_tokens=4, dim_mult=[1, 2], num_heads=2, head_dim=16,
                num_res_blocks=1, attn_scales=[1.0, 0.5], dropout=0.0,
                temporal_attention=True, use_checkpoint=False)
    t2v_mod = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.unet.unet_t2v")
    torch.manual_seed(0)
    t2v = t2v_mod.UNetSD_T2VBase(**tiny, use_fps_condition=False).eval()
    (w / "t2v").mkdir(exist_ok=True)
    torch.save(t2v.state_dict(), w / "t2v" / "zeroscope_tiny.pth")

    i2v_mod = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.unet.unet_i2vgen")
    torch.manual_seed(1)
    i2v = i2v_mod.UNetSD_I2VGen(**tiny, concat_dim=4,
                                adapter_transformer_layers=1).eval()
    (w / "i2vgen").mkdir(exist_ok=True)
    torch.save(i2v.state_dict(), w / "i2vgen" / "i2vgen_tiny.pth")


def build_all(weights_dir, geometry: str = "tiny") -> pathlib.Path:
    w = pathlib.Path(weights_dir)
    w.mkdir(parents=True, exist_ok=True)
    build_llama_lora_clip(w, geometry)
    build_clip_tokenizer(w)
    build_seem(w)
    build_gligen(w)
    build_nla(w)
    build_video_unets(w)
    build_video_extras(w)
    try:
        build_stablevideo_controlnet(w)
    except Exception as e:  # vendored cldm needs heavy shims; a dry run
        # without task F is still a dry run (the assembly reports it)
        print(f"stablevideo controlnet bundle skipped: {e}")
    return w


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("weights_dir")
    p.add_argument("--geometry", choices=("real", "tiny"), default="tiny")
    args = p.parse_args(argv)
    build_all(args.weights_dir, args.geometry)
    print(f"synthetic weights ({args.geometry}) written to {args.weights_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
