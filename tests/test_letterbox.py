"""
Letterbox / coordinate-rescaling tests: hand-computed goldens for the
YOLOv5-style geometry (the 'classic' compatibility path of the reference,
pytorch_detector.py:1030-1068), plus scale_coords round-trip checks.
"""

import numpy as np
import pytest

from megadetector_tpu.ops import boxes as box_ops


def _img(h, w, value=200):
    return np.full((h, w, 3), value, dtype=np.uint8)


def test_letterbox_1080p_to_1280_auto():
    # 1920x1080 -> r=2/3 -> 1280x720, pad height to 768 (next mult of 64)
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(1080, 1920), new_shape=1280, stride=64, auto=True)
    assert im.shape == (768, 1280, 3)
    assert ratio[0] == pytest.approx(2 / 3)
    assert dw == 0
    assert dh == pytest.approx(24.0)
    # Pad rows are gray 114
    assert (im[:24] == 114).all()
    assert (im[-24:] == 114).all()
    assert (im[24:-24] == 200).all()


def test_letterbox_square_no_pad():
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(640, 640), new_shape=1280, stride=64, auto=True)
    assert im.shape == (1280, 1280, 3)
    assert ratio[0] == pytest.approx(2.0)
    assert dw == 0 and dh == 0


def test_letterbox_no_scaleup():
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(640, 640), new_shape=1280, stride=64, auto=True, scaleup=False)
    assert ratio[0] == 1.0
    # 640 is already a multiple of 64 -> no padding in auto mode
    assert im.shape == (640, 640, 3)


def test_letterbox_full_canvas():
    # auto=False pads to the exact canvas (the TPU fixed-shape path)
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(1080, 1920), new_shape=(1280, 1280), stride=64, auto=False)
    assert im.shape == (1280, 1280, 3)
    assert dh == pytest.approx(280.0)
    assert dw == 0


def test_letterbox_odd_pad_split():
    # 100x200 -> r=6.4 with new_shape 1280: unpad (1280, 640), dh=640
    # auto: 640 % 64 = 0
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(100, 200), new_shape=1280, stride=64, auto=True)
    assert im.shape[1] == 1280
    assert im.shape[0] % 64 == 0


def test_letterbox_odd_padding_rounding():
    # Force an odd total pad: 99-high image, no auto.
    # r = min(128/99, 128/128) = 128/99 -> unpad height 128? No:
    # shape (99, 128): r = 1.0 (128/128 limits), unpad (128, 99),
    # dh = 29 -> dh/2 = 14.5 -> top=round(14.4)=14, bottom=round(14.6)=15
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(99, 128), new_shape=(128, 128), stride=32, auto=False)
    assert im.shape == (128, 128, 3)
    assert (im[:14] == 114).all()
    assert (im[-15:] == 114).all()
    assert (im[14:-15] == 200).all()


def test_compute_stride_target_shape():
    # The reference's 'modern' target-shape math
    t = box_ops.compute_stride_target_shape((1080, 1920), 1280, 64, pad=0.5)
    assert t[1] == 1280 or t[1] == 1280 + 64
    assert t[0] % 64 == 0 and t[1] % 64 == 0
    # Square image
    t = box_ops.compute_stride_target_shape((640, 640), 1280, 64, pad=0.5)
    assert t[0] == t[1]


def test_scale_coords_round_trip():
    rng = np.random.RandomState(1)
    h0, w0 = 1080, 1920
    im, ratio, (dw, dh) = box_ops.letterbox(
        _img(h0, w0), new_shape=1280, stride=64, auto=True)
    h1, w1 = im.shape[:2]

    # Random boxes in original pixel coords
    x0 = rng.uniform(0, w0 - 100, 10)
    y0 = rng.uniform(0, h0 - 100, 10)
    bw = rng.uniform(20, 100, 10)
    bh = rng.uniform(20, 100, 10)
    orig = np.stack([x0, y0, x0 + bw, y0 + bh], axis=1)

    # Map into letterboxed coords, then back
    canvas = orig.copy()
    canvas[:, [0, 2]] = canvas[:, [0, 2]] * ratio[0] + dw
    canvas[:, [1, 3]] = canvas[:, [1, 3]] * ratio[1] + dh
    back = box_ops.scale_coords((h1, w1), canvas.copy(), (h0, w0))
    np.testing.assert_allclose(back, orig, atol=1e-6)


def test_scale_coords_with_ratio_pad():
    coords = np.array([[100.0, 50.0, 200.0, 150.0]])
    out = box_ops.scale_coords(
        (768, 1280), coords.copy(), (1080, 1920),
        ratio_pad=((2 / 3, 2 / 3), (0.0, 24.0)))
    expected = np.array([[150.0, 39.0, 300.0, 189.0]])
    np.testing.assert_allclose(out, expected, atol=1e-9)


def test_scale_coords_clips():
    coords = np.array([[-50.0, -20.0, 5000.0, 4000.0]])
    out = box_ops.scale_coords((1280, 1280), coords.copy(), (500, 600))
    assert out[0, 0] >= 0 and out[0, 1] >= 0
    assert out[0, 2] <= 600 and out[0, 3] <= 500


def test_xyxy_xywh_round_trip():
    rng = np.random.RandomState(2)
    xyxy = rng.uniform(0, 1000, (20, 4))
    xyxy[:, 2:] = xyxy[:, :2] + np.abs(xyxy[:, 2:] - xyxy[:, :2])
    back = box_ops.xywh2xyxy(box_ops.xyxy2xywh(xyxy))
    np.testing.assert_allclose(back, xyxy, atol=1e-9)


def test_resize_long_side():
    im = _img(1080, 1920)
    out, r = box_ops.resize_long_side(im, 1280)
    assert max(out.shape[:2]) == 1280
    assert r == pytest.approx(1280 / 1920)
    out, r = box_ops.resize_long_side(im, 1920)
    assert r == 1.0
    assert out.shape == im.shape
    # ceil mode
    out, r = box_ops.resize_long_side(_img(333, 555), 1280, use_ceil=True)
    assert out.shape[1] == int(np.ceil(555 * 1280 / 555))
