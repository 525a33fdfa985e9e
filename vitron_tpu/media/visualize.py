"""Visualization: mask / box / panoptic overlays.

Lightweight PIL/numpy replacement for the reference's vendored
detectron2-style Visualizer (reference: modules/SEEM/demo_code/tasks/
visualizer.py, 1,282 LoC) and the bbox plotting helper
(vitron/mm_utils.py:16-48 show_image_with_bboxes). Covers what the demos
actually draw: binary-mask tints with contours, labeled boxes, panoptic
color maps.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# 133-entry color list seeded deterministically (the reference uses
# detectron2's random_color per class)
_rng = np.random.RandomState(42)
COLORS = (_rng.rand(133, 3) * 200 + 40).astype(np.uint8)


def draw_binary_mask(image: np.ndarray, mask: np.ndarray,
                     color: Optional[Sequence[int]] = None,
                     alpha: float = 0.5) -> np.ndarray:
    """Tint `mask` pixels and draw its contour. image uint8 [H, W, 3]."""
    out = image.astype(np.float32).copy()
    color = np.asarray(color if color is not None else COLORS[0], np.float32)
    m = mask.astype(bool)
    out[m] = out[m] * (1 - alpha) + color * alpha
    edge = _mask_edges(m)
    out[edge] = color
    return out.astype(np.uint8)


def _mask_edges(m: np.ndarray) -> np.ndarray:
    e = np.zeros_like(m)
    e[:-1] |= m[:-1] != m[1:]
    e[:, :-1] |= m[:, :-1] != m[:, 1:]
    return e & _dilate(m)


def _dilate(m: np.ndarray) -> np.ndarray:
    out = m.copy()
    out[1:] |= m[:-1]
    out[:-1] |= m[1:]
    out[:, 1:] |= m[:, :-1]
    out[:, :-1] |= m[:, 1:]
    return out


def draw_boxes(image: np.ndarray, boxes: Sequence[Sequence[float]],
               labels: Optional[Sequence[str]] = None,
               width: int = 2) -> np.ndarray:
    """Draw (x1, y1, x2, y2) pixel boxes (+ optional labels via PIL)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image)
    d = ImageDraw.Draw(img)
    for i, b in enumerate(boxes):
        color = tuple(int(c) for c in COLORS[i % len(COLORS)])
        d.rectangle([b[0], b[1], b[2], b[3]], outline=color, width=width)
        if labels and i < len(labels):
            d.text((b[0] + 2, max(b[1] - 12, 0)), labels[i], fill=color)
    return np.asarray(img)


def draw_panoptic(image: np.ndarray, panoptic: np.ndarray,
                  segments, class_names: Optional[Sequence[str]] = None,
                  alpha: float = 0.55) -> Tuple[np.ndarray, Dict[int, str]]:
    """Color each panoptic segment; returns (overlay, {segment_id: label})
    (the demo's Panoptic tab output, tasks/interactive.py:111-133)."""
    out = image.astype(np.float32).copy()
    labels: Dict[int, str] = {}
    for seg in segments:
        color = COLORS[seg.category_id % len(COLORS)].astype(np.float32)
        m = panoptic == seg.id
        out[m] = out[m] * (1 - alpha) + color * alpha
        name = (class_names[seg.category_id]
                if class_names and seg.category_id < len(class_names)
                else str(seg.category_id))
        labels[seg.id] = name.replace("-other", "").replace("-merged", "")
    return out.astype(np.uint8), labels


def masks_to_video_overlay(frames: np.ndarray, masks: np.ndarray,
                           color: Optional[Sequence[int]] = None) -> np.ndarray:
    """Per-frame mask overlay for tracking output ([T,H,W,3] + [T,h,w])."""
    out = []
    for f, m in zip(frames, masks):
        if m.shape != f.shape[:2]:
            reps = (f.shape[0] // m.shape[0], f.shape[1] // m.shape[1])
            m = np.kron(m, np.ones(reps, bool))[: f.shape[0], : f.shape[1]]
        out.append(draw_binary_mask(f, m, color))
    return np.stack(out)
