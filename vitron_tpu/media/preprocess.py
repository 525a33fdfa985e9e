"""Device-side media preprocessing.

Rebuilds the reference processors as jittable jnp programs:
- image (reference: languagebind/image/processing_image.py:15-82):
  /255 -> bicubic resize (short side 224) -> center crop 224 -> normalize
  with the OpenAI CLIP mean/std.
- video (reference: languagebind/video/processing_video.py:26-114):
  uniform-sample `num_frames` -> /255 -> normalize -> short-side scale 224
  -> center crop. The reference also applies RandomHorizontalFlip(p=.5)
  even at inference (processing_video.py:52) — a nondeterminism quirk;
  here flipping is OFF by default behind `random_flip` for training compat.

The reference runs these per-item on CPU via torchvision (the CPU hot loop
in SURVEY §3.1); here a whole media batch is one fused XLA program on
device — resize/normalize/patchify fuse into the tower's first matmul.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.constants import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    VISION_IMAGE_SIZE,
)


def uniform_frame_indices(num_total: int, num_frames: int) -> np.ndarray:
    """Reference frame sampling: np.linspace(0, N-1, 8, dtype=int)
    (processing_video.py:93)."""
    return np.linspace(0, num_total - 1, num_frames, dtype=int)


def _resize_short_side(img: jax.Array, target: int, method: str) -> jax.Array:
    """img: [..., H, W, C]; scale so min(H', W') == target (static shapes)."""
    h, w = img.shape[-3], img.shape[-2]
    if h <= w:
        nh, nw = target, max(target, int(round(w * target / h)))
    else:
        nh, nw = max(target, int(round(h * target / w))), target
    out_shape = img.shape[:-3] + (nh, nw, img.shape[-1])
    return jax.image.resize(img, out_shape, method=method)


def _center_crop(img: jax.Array, size: int) -> jax.Array:
    h, w = img.shape[-3], img.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[..., top : top + size, left : left + size, :]


def preprocess_image(
    pixels: jax.Array,
    size: int = VISION_IMAGE_SIZE,
    mean=OPENAI_DATASET_MEAN,
    std=OPENAI_DATASET_STD,
) -> jax.Array:
    """uint8/float [..., H, W, 3] -> normalized [..., size, size, 3] float32.

    Matches reference get_image_transform (processing_image.py:40-55):
    ToTensor -> Resize(224, bicubic) -> CenterCrop(224) -> Normalize.
    """
    x = pixels.astype(jnp.float32)
    if pixels.dtype == jnp.uint8:
        x = x / 255.0
    x = _resize_short_side(x, size, "cubic")
    x = _center_crop(x, size)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def preprocess_video(
    frames: jax.Array,
    size: int = VISION_IMAGE_SIZE,
    mean=OPENAI_DATASET_MEAN,
    std=OPENAI_DATASET_STD,
    flip: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """uint8/float [T, H, W, 3] (pre-sampled frames) -> [T, size, size, 3].

    Matches reference get_video_transform decord branch
    (processing_video.py:26-44): /255 -> Normalize -> ShortSideScale(224)
    -> CenterCrop(224); optional horizontal flip replicates the reference's
    RandomHorizontalFlipVideo for bit-parity experiments.
    """
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (x - mean) / std
    x = _resize_short_side(x, size, "linear")  # ShortSideScale uses bilinear
    x = _center_crop(x, size)
    if flip:
        if rng is None:
            raise ValueError("flip=True needs an rng key")
        do = jax.random.bernoulli(rng)
        x = jnp.where(do, x[..., ::-1, :], x)
    return x


def load_video_frames(path: str, num_frames: int = 8,
                      backend: str = "auto") -> np.ndarray:
    """Host-side decode: sample `num_frames` uniformly -> uint8 [T, H, W, 3].

    backend="auto" tries decord (reference default), then OpenCV, then
    pytorchvideo, then imageio — the backend set the reference supports
    (processing_video.py:72-114, incl. its 'pytorchvideo' branch); a
    specific name restricts to that backend (NameError on an unknown one,
    matching the reference's error surface, processing_video.py:67-69).
    """
    known = ("auto", "decord", "opencv", "pytorchvideo", "imageio")
    if backend not in known:
        raise NameError(
            f"video_decode_backend should specify in {known[1:]}")

    def want(name):
        return backend in ("auto", name)

    def _pytorchvideo():
        # EncodedVideo full-clip decode + uniform temporal subsample
        # (processing_video.py:72-86)
        from pytorchvideo.data.encoded_video import EncodedVideo

        video = EncodedVideo.from_path(path, decoder="decord",
                                       decode_audio=False)
        clip = video.get_clip(0, video.duration)["video"]  # [C, T, H, W]
        arr = np.asarray(clip.permute(1, 2, 3, 0).numpy())
        idx = uniform_frame_indices(arr.shape[0], num_frames)
        return arr[idx].astype(np.uint8)

    if backend == "pytorchvideo":
        return _pytorchvideo()
    try:
        if not want("decord"):
            raise ImportError
        import decord

        vr = decord.VideoReader(path, num_threads=1)
        idx = uniform_frame_indices(len(vr), num_frames)
        return vr.get_batch(idx.tolist()).asnumpy()
    except ImportError:
        pass
    try:
        if not want("opencv"):
            raise ImportError
        import cv2

        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        idx = set(uniform_frame_indices(total, num_frames).tolist())
        frames = []
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if i in idx:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            i += 1
        cap.release()
        if frames:
            while len(frames) < num_frames:  # short video: repeat last
                frames.append(frames[-1])
            return np.stack(frames[:num_frames])
    except ImportError:
        pass
    if want("pytorchvideo"):
        try:
            return _pytorchvideo()
        except ImportError:
            pass
    try:
        if not want("imageio"):
            raise ImportError
        import imageio.v3 as iio

        frames = iio.imread(path, plugin="pyav")
        idx = uniform_frame_indices(len(frames), num_frames)
        return np.stack([frames[i] for i in idx])
    except ImportError as e:
        raise RuntimeError(
            "no video decode backend available "
            "(decord/cv2/pytorchvideo/imageio)") from e


def load_image(path: str) -> np.ndarray:
    """Host-side image decode -> uint8 [H, W, 3] RGB."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))
