"""The reference Gradio app's 8 example tabs as scripted e2e fixtures
(reference: app.py:963-1085): each tab's user input + the protocol string a
trained Vitron emits for it, pushed through chat -> parse -> route ->
backend with tiny-config backends. Pins the per-task glue semantics of
app.py:89-342 (placeholder phrases for A, ';'-split phrases for C, fore/back
instruction pair for F, 'segment all' on empty B text).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.system import VitronSystem

from tests.test_system import (  # noqa: F401  (fixture reuse)
    DemoTok,
    ScriptedEngine,
    SeemTok,
    _synthetic_atlas,
    _tiny_editor,
    _tiny_seem,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return vitron_model.VitronConfig.tiny()


def _rand_img(h=64, w=64, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


class _StubTok:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            ids = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][:14] + [127]
            out[i, : len(ids)] = ids
        return {"input_ids": out}


def _gligen_pipe():
    import dataclasses as dc

    from vitron_tpu.models.diffusion import clip_text, gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d, vae

    gcfg = gp.GligenConfig.tiny(steps=4)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    inpaint_cfg = dc.replace(gcfg.unet, in_channels=9)
    return gp.GligenPipeline(
        gcfg, unet2d.init_params(ks[0], gcfg.unet),
        vae.init_params(ks[1], gcfg.vae),
        clip_text.init_params(ks[2], gcfg.text),
        inpaint_unet_params=unet2d.init_params(ks[3], inpaint_cfg,
                                               grounding=True),
        tokenizer=_StubTok())


# ---------------------------------------------------------------- tab 1


def test_tab_image_understanding(tiny_cfg):
    """app.py:963-975: pure QA turn — no module tag, no tool dispatch."""
    user = ("What is the role of the net in a tennis game, and what "
            "strategies might a player adopt when positioned close to the net?")
    sys_ = VitronSystem(ScriptedEngine(
        tiny_cfg, "The net divides the court; close to it, volleys dominate."))
    out = sys_.chat(user, image=_rand_img())
    assert out["status"] == "chat"
    assert "net" in out["text"]


# ---------------------------------------------------------------- tab 2


def test_tab_image_generation(tiny_cfg):
    """app.py:978-991 + the A glue (app.py:89-111): no grounding boxes,
    placeholder phrases."""
    user = ("I've always been fascinated by wolves and their social dynamics."
            " Can you imagine an image where a gray wolf is seen interacting"
            " with its pack, displaying their strong social bonds?")
    raw = ("Certainly! <module>A</module> <instruction>prompt: a gray wolf "
           "interacting with its pack, displaying strong social bonds"
           "</instruction>")
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    sys_.register_gligen(_gligen_pipe())
    out = sys_.chat(user)
    assert out["status"] == "ok" and out["task"] == "image_generation"
    assert out["image"].shape == (32, 32, 3)


# ---------------------------------------------------------------- tab 3


@pytest.mark.nightly
def test_tab_image_segmentation(tiny_cfg):
    """app.py:992-1004 + B glue (app.py:114-155): referred segmentation with
    the annotated overlay."""
    user = "In this photo, can you show me the man who is eating a hotdog?"
    raw = ("<module>B</module> <instruction>target: the man who is eating a "
           "hotdog</instruction>")
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    img = _rand_img(96, 80)
    out = sys_.chat(user, image=img)
    assert out["status"] == "ok" and out["task"] == "image_segmentation"
    assert out["mask"].shape == (96, 80)
    assert out["overlay"].shape == (96, 80, 3)


def test_tab_image_segmentation_segment_all(tiny_cfg):
    """Empty referring text + no stroke = the demo's 'segment all' panoptic
    path (app.py:131-136)."""
    raw = "<module>B</module> <instruction>target: </instruction>"
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    img = _rand_img(64, 64, seed=3)
    out = sys_.chat("segment everything in this image", image=img)
    assert out["status"] == "ok"
    assert out["panoptic"].shape == (64, 64)
    assert out["overlay"].shape == (64, 64, 3)
    # segments/labels agree with the panoptic map ids
    ids = {int(i) for i in np.unique(out["panoptic"]) if i != 0}
    assert set(out["labels"]) == ids


# ---------------------------------------------------------------- tab 4


def test_tab_image_editing_with_marked_region(tiny_cfg):
    """app.py:1006-1018 + C glue sketch path (app.py:195-210): the marked
    region becomes the single grounding/inpaint box."""
    user = "Can you add a sun hat on the dog's head I marked"
    raw = ("<module>C</module> <instruction>edit: a sun hat on the dog's "
           "head</instruction>")
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    sys_.register_gligen(_gligen_pipe())
    img = _rand_img(64, 64, seed=1)
    sketch = np.zeros((64, 64), bool)
    sketch[8:24, 20:44] = True
    out = sys_.chat(user, image=img, sketch_mask=sketch)
    assert out["status"] == "ok" and out["task"] == "image_editing"
    assert out["image"].shape == (32, 32, 3)


def test_tab_image_editing_multi_phrase_seg(tiny_cfg):
    """C glue no-sketch path (app.py:171-186): ';'-separated phrases each
    segmented by SEEM, masks merged, per-phrase boxes."""
    user = "I'd like to replace the white and black motorcycle with a blue bicycle."
    raw = ("<module>C</module> <instruction>edit: Turn the swan's neck into a"
           " wooden sail; Turn the swan into a wood boat</instruction>")
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    sys_.register_gligen(_gligen_pipe())
    out = sys_.chat(user, image=_rand_img(64, 64, seed=2))
    assert out["status"] == "ok" and out["task"] == "image_editing"
    assert out["image"].shape == (32, 32, 3)


# ---------------------------------------------------------------- tab 5


def test_tab_video_understanding(tiny_cfg):
    """app.py:1019-1035: video QA, chat only."""
    user = "What is the man doing in the video?"
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, "He is taking a photo."))
    video = np.random.RandomState(0).randint(0, 255, (8, 32, 32, 3), np.uint8)
    out = sys_.chat(user, video=video)
    assert out["status"] == "chat"


# ---------------------------------------------------------------- tab 6


def test_tab_video_generation(tiny_cfg):
    """app.py:1036-1049 + D glue (app.py:215-240): ZeroScope-style t2v."""
    from vitron_tpu.models.diffusion import (clip_text, unet_sd_video, vae,
                                             video_pipelines)

    user = ("I'm in awe of the beauty of nature. Is there a video that "
            "showcases an aerial view of a tractor working on the fields in "
            "stunning 4K resolution?")
    raw = ("<module>D</module> <instruction>prompt: an aerial view of a "
           "tractor working on the fields, 4K</instruction>")
    cfg = video_pipelines.Text2VideoConfig.tiny(steps=4)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pipe = video_pipelines.Text2VideoPipeline(
        cfg, unet_sd_video.init_params(ks[0], cfg.unet),
        vae.init_params(ks[1], cfg.vae),
        clip_text.init_params(ks[2], cfg.text), tokenizer=_StubTok())
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    sys_.register_text2video(pipe)
    out = sys_.chat(user)
    assert out["status"] == "ok" and out["task"] == "video_generation"
    assert out["video"].shape == (4, 16, 16, 3)


# ---------------------------------------------------------------- tab 7


def test_tab_video_tracking(tiny_cfg):
    """app.py:1050-1062 + E glue (app.py:243-273)."""
    user = "Can you assist me in tracking the woman in the video?"
    raw = "<module>E</module> <instruction>track: the woman</instruction>"
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    video = np.random.RandomState(1).randint(0, 255, (3, 48, 48, 3), np.uint8)
    stroke = np.zeros((48, 48), bool)
    stroke[16:32, 16:32] = True
    out = sys_.chat(user, video=video, sketch_mask=stroke)
    assert out["status"] == "ok" and out["task"] == "video_tracking"
    assert out["masks"].shape[0] == 3
    assert out["overlay_frames"].shape[0] == 3


# ---------------------------------------------------------------- tab 8


@pytest.mark.nightly
def test_tab_video_editing(tiny_cfg):
    """app.py:1063-1074 + F glue (app.py:276-313): fore/back instruction
    pair from the bear snowy-forest example."""
    user = ("Could you swap out the background for a snowy scene, kind of "
            "like a bear strolling through a winter forest?")
    raw = ("<module>F</module> <instruction>foreground: a bear strolling"
           "</instruction><instruction>background: a snowy winter forest"
           "</instruction>")
    atlas = _synthetic_atlas()
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    sys_.register_video_editor(_tiny_editor(with_depth=True),
                               atlas_provider=lambda v, e: atlas,
                               num_keyframes=2)
    out = sys_.chat(user, video=np.zeros((3, 8, 8, 3), np.uint8))
    assert out["status"] == "ok" and out["task"] == "video_editing"
    assert out["video"].shape == (3, 32, 32, 3)


# ---------------------------------------------------------------- tab 9


@pytest.mark.nightly
def test_tab_image_to_video(tiny_cfg):
    """app.py:1075-1089 + G glue (app.py:316-342): i2vgen-style i2v."""
    from vitron_tpu.models.diffusion import (clip_text, unet_sd_video, vae,
                                             video_pipelines)

    user = ("It would be great if this image could be transformed into a "
            "video. Do you think you can assist?")
    raw = ("<module>G</module> <instruction>prompt: animate this scene"
           "</instruction>")
    cfg = video_pipelines.Image2VideoConfig.tiny(steps=5)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    pipe = video_pipelines.Image2VideoPipeline(
        cfg, unet_sd_video.init_params(ks[0], cfg.unet),
        vae.init_params(ks[1], cfg.vae),
        clip_text.init_params(ks[2], cfg.text), tokenizer=_StubTok(),
        image_embedder=lambda img: np.ones((1, cfg.unet.y_dim), np.float32))
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    sys_.register_image2video(pipe)
    out = sys_.chat(user, image=_rand_img(16, 16))
    assert out["status"] == "ok" and out["task"] == "image_to_video"
    assert out["video"].shape == (4, 16, 16, 3)


def test_tab_audio_referred_segmentation_asr_hook(tiny_cfg):
    """Raw audio routes through the installed ASR hook to a transcript, then
    the decoder's AUDIO token group (interactive.py:105-109; the reference's
    whisper load, demo_code/app.py:74-77)."""
    raw = "<module>B</module> <instruction>target: </instruction>"
    sys_ = VitronSystem(ScriptedEngine(tiny_cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    img = _rand_img(64, 48, seed=5)
    wav = np.zeros(1600, np.float32)

    # no hook installed -> clear error, not a crash
    sys_.asr = None
    out = sys_.chat("segment what I said", image=img, extra={"audio": wav})
    assert out["status"] == "error" and "ASR" in out["error"]

    class FakeASR:
        def transcribe(self, audio):
            assert audio is wav
            return {"text": "the red car"}

    sys_.asr = FakeASR()
    out = sys_.chat("segment what I said", image=img, extra={"audio": wav})
    assert out["status"] == "ok" and out["task"] == "image_segmentation"
    assert out["transcript"] == "the red car"
    assert out["mask"].shape == (64, 48)
