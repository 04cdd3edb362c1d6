"""Temporal mask propagation (exporter/mask_propagation.py — the DEVA role
in the reference's GroundingDINO+SAM+DEVA chain, mask_generater.py:24):
flickering per-frame detections must come out temporally consistent."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gstk_tpu.exporter.mask_propagation import propagate_masks


def _make_sequence(n_frames=7, size=96, sq=28, step=3, seed=0):
    """A textured square sliding right over a textured background, plus the
    ground-truth masks."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 120, (size, size), np.uint8)
    tex = rng.integers(135, 255, (sq, sq), np.uint8)
    frames, gts = [], []
    y0 = size // 2 - sq // 2
    for t in range(n_frames):
        x0 = 8 + t * step
        img = bg.copy()
        img[y0 : y0 + sq, x0 : x0 + sq] = tex
        m = np.zeros((size, size), bool)
        m[y0 : y0 + sq, x0 : x0 + sq] = True
        frames.append(np.stack([img] * 3, axis=-1))
        gts.append(m)
    return frames, gts


def _iou(a, b):
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


def test_propagation_fills_dropout_and_overrides_flicker():
    frames, gts = _make_sequence()
    dets = [g.copy() for g in gts]
    dets[3] = np.zeros_like(dets[3])  # detector dropout
    wrong = np.zeros_like(dets[5])  # detector flicker: off-object box
    wrong[2:20, 2:20] = True
    dets[5] = wrong

    out = propagate_masks(frames, dets)
    for t, (m, gt) in enumerate(zip(out, gts)):
        assert _iou(m, gt) > 0.75, f"frame {t}: IoU {_iou(m, gt):.2f}"
    # the flickered frame must no longer look like the wrong box
    assert _iou(out[5], wrong) < 0.2


def test_propagation_fixes_endpoint_flicker_and_dropout():
    """Sequence ENDPOINTS have only one chain direction carrying real
    information; the seeded-chain consolidation must still override a
    frame-0 flicker and fill a last-frame dropout (the naive 3-way vote
    degenerates to the raw detection there)."""
    frames, gts = _make_sequence()
    dets = [g.copy() for g in gts]
    wrong = np.zeros_like(dets[0])
    wrong[2:20, 2:20] = True
    dets[0] = wrong  # flicker on the FIRST frame
    dets[-1] = np.zeros_like(dets[-1])  # dropout on the LAST frame

    out = propagate_masks(frames, dets)
    assert _iou(out[0], gts[0]) > 0.7, f"frame 0 IoU {_iou(out[0], gts[0]):.2f}"
    assert _iou(out[0], wrong) < 0.2
    assert _iou(out[-1], gts[-1]) > 0.7, (
        f"last frame IoU {_iou(out[-1], gts[-1]):.2f}"
    )


def test_propagation_preserves_consistent_detections():
    frames, gts = _make_sequence()
    out = propagate_masks(frames, [g.copy() for g in gts])
    for m, gt in zip(out, gts):
        assert _iou(m, gt) > 0.9


def test_propagation_passthrough_short_sequences():
    frames, gts = _make_sequence(n_frames=1)
    out = propagate_masks(frames, gts)
    np.testing.assert_array_equal(out[0], gts[0])
