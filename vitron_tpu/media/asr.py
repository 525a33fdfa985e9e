"""Speech-to-text hook for audio-referred segmentation.

The reference loads openai-whisper and calls ``audio_model.transcribe(path)
["text"]`` before routing the transcript through SEEM's AUDIO token group
(reference: modules/SEEM/demo_code/app.py:74-77,
tasks/interactive.py:105-109; upstream ships the model load commented out).

TPU-native equivalent: transcription is HOST-side work, so we run Whisper
via transformers (CPU torch is in the image) when a checkpoint is available
on disk, and keep the hook injectable so serving can plug any recognizer
(or a remote service) without touching the routing code. The device never
sees audio — only the transcript enters the jitted SEEM program.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

WHISPER_SR = 16000


def _load_wav_stdlib(path: str):
    """PCM WAV via the stdlib (no soundfile/ffmpeg needed): the format the
    browser fallback recorder and the test fixtures produce."""
    import wave

    with wave.open(path, "rb") as f:
        n, ch, width, file_sr = (f.getnframes(), f.getnchannels(),
                                 f.getsampwidth(), f.getframerate())
        raw = f.readframes(n)
    if width == 2:
        wav = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        wav = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        wav = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        wav = wav.reshape(-1, ch).mean(axis=1)
    return wav, file_sr


def load_audio(path: str, sr: int = WHISPER_SR) -> np.ndarray:
    """Decode an audio file to mono float32 at `sr` Hz (host side).

    Decode order: stdlib `wave` for PCM WAV (always available), then
    soundfile, then ffmpeg — so a dependency-light host can still serve
    WAV uploads (r5: this CI image has neither soundfile nor ffmpeg)."""
    try:
        wav, file_sr = _load_wav_stdlib(path)
    except Exception:
        try:
            import soundfile as sf

            data, file_sr = sf.read(path, dtype="float32", always_2d=True)
            wav = data.mean(axis=1)
        except Exception:
            # fall back to ffmpeg (same dependency whisper itself uses) — on
            # soundfile missing OR failing to decode the container (e.g. mp3
            # on libsndfile builds without mp3 support)
            import subprocess

            out = subprocess.run(
                ["ffmpeg", "-nostdin", "-i", path, "-f", "f32le", "-ac", "1",
                 "-ar", str(sr), "-"],
                capture_output=True, check=True)
            return np.frombuffer(out.stdout, np.float32)
    if file_sr != sr:
        # linear resample on the host; plenty for 16 kHz speech
        n = int(round(len(wav) * sr / file_sr))
        wav = np.interp(np.linspace(0.0, len(wav) - 1.0, n),
                        np.arange(len(wav)), wav).astype(np.float32)
    return wav


class WhisperASR:
    """Lazy-loading Whisper recognizer with a ``transcribe`` matching the
    reference's whisper API surface (result dict with a "text" key).

    model: HF hub id or local dir of a whisper checkpoint. Loading is
    deferred to the first transcribe; construction is free so the serving
    layer can always install the hook and fail with a clear message only
    when audio actually arrives without weights on disk.
    """

    def __init__(self, model: str = "openai/whisper-base",
                 device: str = "cpu"):
        self.model_id = model
        self.device = device
        self._pipe = None

    def _load(self):
        if self._pipe is None:
            from transformers import (WhisperForConditionalGeneration,
                                      WhisperProcessor)

            proc = WhisperProcessor.from_pretrained(self.model_id)
            mdl = WhisperForConditionalGeneration.from_pretrained(
                self.model_id).to(self.device).eval()
            self._pipe = (proc, mdl)
        return self._pipe

    def transcribe(self, audio) -> dict:
        """audio: file path or float32 waveform at 16 kHz. Returns
        {"text": str} (the subset of whisper's result the pipeline uses)."""
        import torch

        if isinstance(audio, (str, os.PathLike)):
            audio = load_audio(str(audio))
        proc, mdl = self._load()
        feats = proc(audio, sampling_rate=WHISPER_SR,
                     return_tensors="pt").input_features.to(self.device)
        with torch.no_grad():
            ids = mdl.generate(feats, max_new_tokens=128)
        text = proc.batch_decode(ids, skip_special_tokens=True)[0].strip()
        return {"text": text}


def default_asr() -> Optional[WhisperASR]:
    """Hook factory for the serving layer: returns a WhisperASR when a
    checkpoint is configured (VITRON_WHISPER env var or the default hub id
    resolvable from the local HF cache), else None — mirroring upstream
    shipping with the whisper load disabled (app.py:76-77)."""
    model = os.environ.get("VITRON_WHISPER")
    if model:
        return WhisperASR(model)
    return None


Transcriber = Callable[[object], dict]
