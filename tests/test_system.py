"""Full-system wiring: chat -> protocol -> backend dispatch for A-G."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.engine import VitronEngine
from vitron_tpu.runtime.system import VitronSystem


class DemoTok:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


class ScriptedEngine:
    """Engine stub that returns a fixed structured response; exercises the
    routing layer without a trained MLLM."""

    class _G:
        def __init__(self, cfg):
            self.cfg = cfg

    def __init__(self, cfg, raw):
        self.generator = self._G(cfg)
        self.raw = raw

    def chat(self, *a, **k):
        return {"raw": self.raw, "text": "", "module": None,
                "instructions": None, "region": None}


@pytest.fixture(scope="module")
def tiny_cfg():
    return vitron_model.VitronConfig.tiny()


def _tiny_seem():
    from vitron_tpu.models.seem import model as seem_model

    cfg = seem_model.SeemConfig.tiny()
    params = seem_model.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


class SeemTok:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            toks = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][:14] + [120]
            ids[i, : len(toks)] = toks
        return {"input_ids": ids, "attention_mask": (ids != 0).astype(np.int64)}


def test_segmentation_route(tiny_cfg):
    sys_ = VitronSystem(ScriptedEngine(
        tiny_cfg,
        "Sure. <module>B</module> <instruction>task: the red ball</instruction>"))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    img = np.random.RandomState(0).randint(0, 255, (96, 80, 3), np.uint8)
    out = sys_.chat("segment the red ball", image=img)
    assert out["status"] == "ok"
    assert out["task"] == "image_segmentation"
    assert out["mask"].shape == (96, 80)


def test_tracking_route(tiny_cfg):
    sys_ = VitronSystem(ScriptedEngine(
        tiny_cfg, "<module>E</module> <instruction>track: the object</instruction>"))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    video = np.random.RandomState(0).randint(0, 255, (3, 64, 64, 3), np.uint8)
    stroke = np.zeros((64, 64), bool)
    stroke[20:40, 20:40] = True
    out = sys_.chat("track this", video=video, sketch_mask=stroke)
    assert out["status"] == "ok"
    assert out["masks"].shape[0] == 3


def test_generation_route(tiny_cfg):
    from vitron_tpu.models.diffusion import clip_text, gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d, vae

    gcfg = gp.GligenConfig.tiny(steps=4)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)

    class Tok:
        def __call__(self, texts, padding=None, max_length=16, truncation=True,
                     return_tensors="np"):
            out = np.zeros((len(texts), max_length), np.int64)
            for i, t in enumerate(texts):
                ids = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][:14] + [127]
                out[i, : len(ids)] = ids
            return {"input_ids": out}

    pipe = gp.GligenPipeline(
        gcfg, unet2d.init_params(ks[0], gcfg.unet),
        vae.init_params(ks[1], gcfg.vae),
        clip_text.init_params(ks[2], gcfg.text), tokenizer=Tok())
    sys_ = VitronSystem(ScriptedEngine(
        tiny_cfg,
        "<module>A</module> <instruction>prompt: a red cube</instruction>"
        " <region>[0.1,0.1,0.6,0.6]</region>"))
    sys_.register_gligen(pipe)
    out = sys_.chat("draw a red cube")
    assert out["status"] == "ok"
    assert out["image"].shape == (32, 32, 3)


def _tiny_editor(with_depth=False):
    from vitron_tpu.models.diffusion import (clip_text, controlnet, depth,
                                             stablevideo, unet2d, vae)

    ucfg = unet2d.UNetConfig.tiny()
    vcfg = vae.VAEConfig.tiny()
    tcfg = clip_text.TextConfig.tiny(hidden_size=16, num_heads=2,
                                     intermediate_size=32)
    kw = {}
    if with_depth:
        dcfg = depth.DPTConfig.tiny()
        kw["depth_control_params"] = controlnet.init_params(
            jax.random.PRNGKey(9), ucfg)
        kw["depth_annotator"] = (depth.init_params(jax.random.PRNGKey(8), dcfg),
                                 dcfg)
    return stablevideo.StableVideoEditor(
        ucfg, unet2d.init_params(jax.random.PRNGKey(0), ucfg, grounding=False),
        controlnet.init_params(jax.random.PRNGKey(1), ucfg),
        vcfg, vae.init_params(jax.random.PRNGKey(2), vcfg),
        tcfg, clip_text.init_params(jax.random.PRNGKey(3), tcfg),
        tokenizer=SeemTok(), **kw)


def _synthetic_atlas(t=3, h=32, w=32, ah=32, aw=32):
    """Identity-ish UV maps + a centered fg alpha blob."""
    ys = np.linspace(-1, 1, h, dtype=np.float32)
    xs = np.linspace(-1, 1, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    uv = np.stack([gx, gy], -1)
    rs = np.random.RandomState(0)
    alpha = np.zeros((h, w, 1), np.float32)
    alpha[10:22, 10:22] = 1.0
    return {
        "fg_atlas": rs.rand(ah, aw, 3).astype(np.float32),
        "bg_atlas": rs.rand(ah, aw, 3).astype(np.float32),
        "fg_uv": np.broadcast_to(uv, (t, h, w, 2)).copy(),
        "bg_uv": np.broadcast_to(uv, (t, h, w, 2)).copy(),
        "alpha": np.broadcast_to(alpha, (t, h, w, 1)).copy(),
    }


def test_video_editing_route_foreground_and_background(tiny_cfg):
    """F full flow (StableVideo/app.py:79-280): instruction[0] edits the
    foreground via per-keyframe propagation + atlas scatter/median,
    instruction[1] edits the background with the depth ControlNet; a
    foreground-only edit must change frames only inside alpha."""
    from vitron_tpu.models.diffusion import stablevideo as sv

    atlas = _synthetic_atlas()
    editor = _tiny_editor(with_depth=True)

    sys_ = VitronSystem(ScriptedEngine(
        tiny_cfg,
        "<module>F</module> <instruction>make the object golden</instruction>"
        "<instruction>turn the background into night</instruction>"))
    sys_.register_video_editor(editor, atlas_provider=lambda v, e: atlas,
                               num_keyframes=2)
    out = sys_.chat("edit the video", video=np.zeros((3, 8, 8, 3), np.uint8))
    assert out["status"] == "ok"
    assert out["video"].shape == (3, 32, 32, 3)

    # foreground-only: pixels outside alpha must be the original render
    original = np.asarray(sv.render_frames(
        jnp.asarray(atlas["fg_atlas"]), jnp.asarray(atlas["bg_atlas"]),
        jnp.asarray(atlas["fg_uv"]), jnp.asarray(atlas["bg_uv"]),
        jnp.asarray(atlas["alpha"])))
    original = (np.clip(original, 0, 1) * 255).astype(np.uint8)

    sys2 = VitronSystem(ScriptedEngine(
        tiny_cfg,
        "<module>F</module> <instruction>make the object golden</instruction>"))
    sys2.register_video_editor(editor, atlas_provider=lambda v, e: atlas,
                               num_keyframes=2)
    out2 = sys2.chat("edit", video=np.zeros((3, 8, 8, 3), np.uint8))
    assert out2["status"] == "ok"
    frames = out2["video"]
    outside = atlas["alpha"][..., 0] == 0.0
    np.testing.assert_array_equal(frames[outside], original[outside])
    inside = atlas["alpha"][..., 0] > 0.0
    assert (frames[inside].astype(int) - original[inside].astype(int) != 0).any()


@pytest.mark.nightly
def test_advanced_edit_foreground_aggnet():
    """AGGNet refinement runs and returns a finite atlas (app.py:256-276)."""
    from vitron_tpu.models.diffusion import stablevideo as sv

    atlas = _synthetic_atlas(t=2)
    editor = _tiny_editor()
    kfs = [(atlas["fg_atlas"] * 255).astype(np.uint8)] * 2
    uvs = [atlas["fg_uv"][0], atlas["fg_uv"][1]]
    alphas = [atlas["alpha"][0], atlas["alpha"][1]]
    agg = sv.advanced_edit_foreground(
        editor, kfs, uvs, alphas, atlas["fg_atlas"].shape[:2],
        "a golden object", steps=4, aggnet_refine=True, aggnet_epochs=3)
    assert agg.shape == atlas["fg_atlas"].shape
    assert np.isfinite(agg).all()


def test_end_to_end_chat_with_real_engine(tiny_cfg):
    """Real tiny engine + image through the whole stack (random weights ->
    chat fallthrough)."""
    params = vitron_model.init_params(jax.random.PRNGKey(0), tiny_cfg)
    engine = VitronEngine(params, tiny_cfg, DemoTok())
    sys_ = VitronSystem(engine)
    img = np.random.RandomState(0).randint(0, 255, (64, 48, 3), np.uint8)
    from vitron_tpu.runtime.generation import SamplingConfig

    out = sys_.chat("what is this?", image=img,
                    sampling=SamplingConfig(greedy=True, max_new_tokens=4,
                                            eos_ids=()))
    assert out["status"] == "chat"
    assert len(out["reply"]["raw"]) > 0


def test_multiturn_history_and_stop_string(tiny_cfg):
    """Multi-turn chat through VitronEngine with a tokenizer whose decode
    emits the conv stop string: generation must halt early via the
    KeywordStopper (mm_utils.py:146-177 semantics)."""
    from vitron_tpu.runtime.engine import VitronEngine
    from vitron_tpu.runtime.generation import SamplingConfig

    class StopTok:
        bos_token_id = 1
        eos_token_id = 2

        def __call__(self, s):
            class R:
                pass

            r = R()
            r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
            return r

        def decode(self, ids, skip_special_tokens=True):
            # every 4th generated token decodes as the llava_v1 stop "</s>"
            return " ".join("</s>" if t % 4 == 0 else f"w{t}" for t in ids)

    params = vitron_model.init_params(jax.random.PRNGKey(0), tiny_cfg)
    engine = VitronEngine(params, tiny_cfg, StopTok())
    out = engine.chat(
        "hello", history=[("hi", "hello there"), ("how are you", "fine")],
        sampling=SamplingConfig(greedy=True, max_new_tokens=64, eos_ids=()))
    # stopper checks every 8 tokens; far fewer than 64 should be produced
    n_tokens = len(out["raw"].split())
    assert n_tokens < 64
