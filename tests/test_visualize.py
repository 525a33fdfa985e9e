"""Annotated visualizer: golden checks on a synthetic panoptic output
(reference semantics: modules/SEEM/demo_code/tasks/visualizer.py)."""
import numpy as np
import pytest

from vitron_tpu.media import visualize as vz
from vitron_tpu.models.seem.postprocess import COCO_PANOPTIC_CLASSES


def _base(h=160, w=160, val=100):
    return np.full((h, w, 3), val, np.uint8)


def _synthetic():
    """Panoptic map: big stuff segment (grass-merged, id 1), two things
    (person id 2, dog id 3) with scores."""
    pan = np.zeros((160, 160), np.int32)
    pan[:, :] = 1
    pan[20:70, 20:70] = 2
    pan[90:150, 90:150] = 3
    segments = [
        {"id": 1, "category_id": 125, "isthing": False},   # grass-merged
        {"id": 2, "category_id": 0, "isthing": True, "score": 0.97},   # person
        {"id": 3, "category_id": 16, "isthing": True, "score": 0.81},  # dog
    ]
    return pan, segments


def test_panoptic_labels_and_colors():
    pan, segs = _synthetic()
    out, labels = vz.draw_panoptic(_base(), pan, segs,
                                   class_names=COCO_PANOPTIC_CLASSES,
                                   alpha=0.7)
    assert out.dtype == np.uint8 and out.shape == (160, 160, 3)
    # '-merged' stripped; things get "name score%" labels
    assert labels[1] == "grass"
    assert labels[2] == "person 97%"
    assert labels[3] == "dog 81%"
    # probe pixels away from contours and centroid text: exact alpha blend
    for seg_id, cat, xy in [(1, 125, (5, 5)), (2, 0, (24, 24)), (3, 16, (94, 94))]:
        want = 0.3 * 100 + 0.7 * vz.category_color(cat).astype(np.float32)
        got = out[xy[1], xy[0]].astype(np.float32)
        np.testing.assert_allclose(got, want, atol=2.0), (seg_id, got, want)
    # the class text actually rendered: some pixels near each centroid
    # differ from the pure tint
    blend_only, _ = vz.draw_panoptic(_base(), pan, segs, class_names=None,
                                     alpha=0.7)
    cy, cx = 45, 45  # person centroid
    region = slice(cy - 10, cy + 10), slice(cx - 30, cx + 30)
    assert (out[region] != blend_only[region]).any()


def test_panoptic_deterministic():
    pan, segs = _synthetic()
    a, _ = vz.draw_panoptic(_base(), pan, segs, COCO_PANOPTIC_CLASSES)
    b, _ = vz.draw_panoptic(_base(), pan, segs, COCO_PANOPTIC_CLASSES)
    assert np.array_equal(a, b)


def test_area_threshold_drops_small_stuff():
    pan = np.zeros((64, 64), np.int32)
    pan[:4, :4] = 7
    segs = [{"id": 7, "category_id": 120, "isthing": False}]
    out, _ = vz.draw_panoptic(_base(64, 64), pan, segs,
                              COCO_PANOPTIC_CLASSES, area_threshold=100)
    assert np.array_equal(out, _base(64, 64))


def test_sem_seg_small_segment_survives():
    """Largest-first draw order: a small segment drawn later must keep its
    own color (visualizer.py:446-458 sorts by area desc)."""
    sem = np.zeros((128, 128), np.int32)
    sem[96:112, 96:112] = 5
    out = vz.draw_sem_seg(_base(128, 128), sem,
                          class_names=COCO_PANOPTIC_CLASSES, alpha=0.7)
    want = 0.3 * 100 + 0.7 * vz.category_color(5).astype(np.float32)
    # probe inside the small segment, below its own text rows and away
    # from both contours and the big segment's centroid text
    np.testing.assert_allclose(out[109, 100].astype(np.float32), want, atol=2.0)


def test_instance_score_filter():
    """keep = scores > 0.8 (visualizer.py:398-403)."""
    masks = np.zeros((2, 96, 96), bool)
    masks[0, 8:40, 8:40] = True
    masks[1, 56:88, 56:88] = True
    out = vz.draw_instance_predictions(
        _base(96, 96), masks, classes=[0, 16], scores=[0.95, 0.5],
        class_names=COCO_PANOPTIC_CLASSES)
    # instance 0 drawn
    w0 = 0.6 * 100 + 0.4 * vz.category_color(0).astype(np.float32)
    np.testing.assert_allclose(out[10, 10].astype(np.float32), w0, atol=2.0)
    # instance 1 filtered out: untouched base
    assert (out[60:85, 60:85] == 100).all()


def test_create_text_labels_parity():
    assert vz._create_text_labels([0, 16], [0.5, 0.25],
                                  COCO_PANOPTIC_CLASSES) == \
        ["person 50%", "dog 25%"]
    assert vz._create_text_labels([1], None, None) == ["1"]
    assert vz._create_text_labels(None, [0.5], None) == ["50%"]


def test_handler_overlay_shape():
    """system.handle_b/e attach overlays; check the building blocks used
    there behave on odd dtypes."""
    img = np.random.RandomState(0).rand(40, 50, 3) * 255
    m = np.zeros((40, 50), bool)
    m[10:20, 10:30] = True
    out = vz.draw_binary_mask(np.clip(img, 0, 255).astype(np.uint8), m,
                              color=vz.COLORS[0], text="cat", alpha=0.5)
    assert out.shape == (40, 50, 3) and out.dtype == np.uint8
    frames = np.clip(np.random.RandomState(1).rand(3, 32, 32, 3) * 255,
                     0, 255).astype(np.uint8)
    masks = np.zeros((3, 16, 16), bool)
    masks[:, 4:8, 4:8] = True
    ov = vz.masks_to_video_overlay(frames, masks)
    assert ov.shape == frames.shape
