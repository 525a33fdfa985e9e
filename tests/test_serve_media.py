"""Serve API media contract: video round-trip + audio-referred segmentation.

The reference Gradio UI takes video uploads and (disabled) audio for tasks
E/F/G (reference: app.py:839-1131); r3's browser page accepted images only.
These live-socket tests pin the JSON contract the new UI drives: a
video_frames upload routes through E (tracking) and returns overlay frames,
and an audio file routes through the ASR hook into B (audio-referred
segmentation) returning a mask + transcript.
"""
import base64
import os
import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from vitron_tpu.apps.serve import serve
from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.system import VitronSystem

from tests.test_system import (  # noqa: F401  (fixture reuse)
    ScriptedEngine,
    SeemTok,
    _tiny_seem,
)


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(base, payload, timeout=600):
    req = urllib.request.Request(
        base + "/chat", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _system(raw: str) -> VitronSystem:
    cfg = vitron_model.VitronConfig.tiny()
    sys_ = VitronSystem(ScriptedEngine(cfg, raw))
    params, scfg = _tiny_seem()
    sys_.register_seem(params, scfg, SeemTok())
    return sys_


def test_video_tracking_round_trip():
    raw = "<module>E</module> <instruction>track: the object</instruction>"
    srv = serve(_system(raw), host="127.0.0.1", port=0, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        rs = np.random.RandomState(0)
        frames = [rs.randint(0, 255, (48, 64, 3), np.uint8) for _ in range(4)]
        sketch = np.zeros((48, 64), np.uint8)
        sketch[10:30, 20:40] = 255
        out = _post(base, {
            "prompt": "track the object I circled",
            "video_frames": [_png_b64(f) for f in frames],
            "sketch": _png_b64(np.stack([sketch] * 3, -1)),
            "greedy": True})
        assert out.get("error") is None, out
        assert out["task"] == "video_tracking"
        assert len(out["masks"]) == 4
        assert len(out["overlay_frames"]) == 4
        # each overlay decodes back to a frame-shaped PNG
        from PIL import Image

        im = Image.open(io.BytesIO(base64.b64decode(out["overlay_frames"][0])))
        assert im.size[1] > 0
    finally:
        srv.shutdown()


class FakeASR:
    """Stand-in recognizer with the whisper transcribe() surface."""

    def __init__(self):
        self.calls = []

    def transcribe(self, audio):
        self.calls.append(audio)
        return {"text": "the red ball"}


def test_audio_referred_segmentation_with_fake_asr():
    raw = "<module>B</module> <instruction>target: </instruction>"
    system = _system(raw)
    asr = FakeASR()
    system.asr = asr
    srv = serve(system, host="127.0.0.1", port=0, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        img = np.random.RandomState(1).randint(0, 255, (64, 64, 3), np.uint8)
        out = _post(base, {
            "prompt": "segment what I describe in the audio",
            "image": _png_b64(img),
            "audio": base64.b64encode(b"fake-audio-bytes").decode(),
            "greedy": True})
        assert out.get("error") is None, out
        assert out["task"] == "image_segmentation"
        assert out["transcript"] == "the red ball"
        assert "mask" in out and "overlay" in out
        # the hook received a host temp file path carrying the posted bytes
        assert len(asr.calls) == 1 and isinstance(asr.calls[0], str)
    finally:
        srv.shutdown()


def test_audio_without_asr_hook_is_a_clear_error():
    raw = "<module>B</module> <instruction>target: </instruction>"
    system = _system(raw)
    system.asr = None
    srv = serve(system, host="127.0.0.1", port=0, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        img = np.zeros((32, 32, 3), np.uint8)
        out = _post(base, {
            "prompt": "segment it",
            "image": _png_b64(img),
            "audio": base64.b64encode(b"x").decode()})
        assert out["status"] == "error"
        assert "ASR" in out["error"]
    finally:
        srv.shutdown()


def test_index_page_offers_video_and_audio_inputs():
    """The browser page must expose video/audio upload and frame playback
    (reference Gradio surface parity, app.py:839-1131)."""
    raw = "<module>B</module> <instruction>target: x</instruction>"
    srv = serve(_system(raw), host="127.0.0.1", port=0, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        with urllib.request.urlopen(base + "/", timeout=60) as r:
            html = r.read().decode()
        assert 'id="video" accept="video/*"' in html
        assert 'id="audio" accept="audio/*"' in html
        assert "sampleVideo" in html and "playFrames" in html
    finally:
        srv.shutdown()


# ---------------------------------------------------------------- real ASR

def _write_wav(path, wav, sr):
    """Minimal PCM16 WAV writer (no soundfile dependency)."""
    import struct
    import wave

    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def test_load_audio_decodes_and_resamples(tmp_path):
    """media/asr.load_audio: real file decode on the host + linear resample
    to Whisper's 16 kHz (the part of the ASR path that runs everywhere;
    reference: whisper's own ffmpeg load, interactive.py:105-109)."""
    from vitron_tpu.media.asr import WHISPER_SR, load_audio

    sr_in = 8000
    t = np.arange(sr_in, dtype=np.float32) / sr_in          # 1 s
    wav = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    _write_wav(p, wav, sr_in)
    out = load_audio(str(p))
    assert out.dtype == np.float32
    assert abs(len(out) - WHISPER_SR) <= 2                  # 1 s at 16 kHz
    # energy survives the resample (it's a pure tone, not silence)
    assert 0.2 < float(np.sqrt((out ** 2).mean())) < 0.6


def test_whisper_asr_integration_if_cached(tmp_path):
    """Optional-dependency integration: the REAL WhisperASR adapter end to
    end (feature extraction -> generate -> batch_decode), iff a whisper
    checkpoint is resolvable offline from the local HF cache. Skips
    cleanly otherwise — mirroring upstream shipping with the whisper load
    commented out (SEEM demo_code/app.py:74-77)."""
    transformers = pytest.importorskip("transformers")

    model_id = os.environ.get("VITRON_WHISPER", "openai/whisper-tiny")
    try:
        transformers.WhisperProcessor.from_pretrained(
            model_id, local_files_only=True)
    except Exception:
        pytest.skip(f"no local whisper checkpoint for {model_id!r} "
                    "(zero-egress host)")

    from vitron_tpu.media.asr import WHISPER_SR, WhisperASR

    t = np.arange(WHISPER_SR, dtype=np.float32) / WHISPER_SR
    wav = (0.1 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    _write_wav(p, wav, WHISPER_SR)
    out = WhisperASR(model_id).transcribe(str(p))
    assert isinstance(out, dict) and isinstance(out.get("text"), str)
