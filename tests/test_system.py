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
