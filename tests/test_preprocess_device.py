"""On-device letterbox vs host cv2 letterbox parity tests."""

import numpy as np
import pytest

from megadetector_tpu.ops import boxes as box_ops
from megadetector_tpu.ops.preprocess_device import (letterbox_batch,
                                                    stage_images)

cv2 = pytest.importorskip('cv2')


def _compare_one(h, w, out_size, seed=0, atol=4.0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)

    host, ratio, pad = box_ops.letterbox(
        img, (out_size, out_size), auto=False, scaleup=True)

    staged, sizes = stage_images([img])
    device = np.asarray(letterbox_batch(staged, sizes, out_size))[0] * 255.0

    assert host.shape == device.shape
    diff = np.abs(device - host.astype(np.float32))
    # cv2 uses fixed-point bilinear; allow small per-pixel deviation and
    # require near-exact agreement overall
    assert np.mean(diff) < 1.0, 'mean diff {}'.format(np.mean(diff))
    assert np.percentile(diff, 99) <= atol, \
        '99p diff {}'.format(np.percentile(diff, 99))


def test_device_letterbox_downscale():
    _compare_one(480, 640, 128)


def test_device_letterbox_upscale():
    _compare_one(50, 70, 128)


def test_device_letterbox_tall():
    _compare_one(300, 100, 128)


def test_device_letterbox_exact_fit():
    _compare_one(128, 128, 128)


def test_pad_region_is_gray():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 128, 3), dtype=np.uint8)
    staged, sizes = stage_images([img])
    out = np.asarray(letterbox_batch(staged, sizes, 128))[0] * 255.0
    # 64x128 -> resized to 128 wide, 128 tall region = 128; r=1 -> wait:
    # r = min(128/64, 128/128) = 1 -> image occupies rows 32..96
    assert np.allclose(out[:32], 114.0, atol=0.5)
    assert np.allclose(out[96:], 114.0, atol=0.5)


def test_resize_dtype_bf16_drift_bounded():
    """bf16 matmul operands (the production fast path: ~5x on v5e where
    f32 matmuls are emulated) must stay within ~2 u8 levels of the exact
    f32 resize — uint8 pixels are exact in bf16, only the fractional
    interpolation weights round."""

    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(480, 640), (97, 211)]]
    staged, sizes = stage_images(imgs)
    exact = np.asarray(letterbox_batch(staged, sizes, 128)) * 255.0
    fast = np.asarray(letterbox_batch(
        staged, sizes, 128, resize_dtype=jnp.bfloat16)) * 255.0
    diff = np.abs(fast - exact)
    assert np.percentile(diff, 99) <= 2.0, np.percentile(diff, 99)
    assert diff.max() <= 4.0, diff.max()
    # and the fast path still matches the host letterbox at the
    # standard tolerance
    for i, im in enumerate(imgs):
        host, _, _ = box_ops.letterbox(im, (128, 128), auto=False,
                                       scaleup=True)
        d = np.abs(fast[i] - host.astype(np.float32))
        assert np.mean(d) < 1.0 and np.percentile(d, 99) <= 4.0


def test_fold_layout_h2_is_pure_relayout():
    """letterbox(fold_layout='h2') must be bit-identical to
    fold_canvas_h2(planar letterbox) — the in-epilogue permute changes
    only the layout, never a value — and fold_canvas_h2 itself must
    match the model-side fold view (models/yolov5._apply_folded_layer's
    h2 branch: channel k = q*12 + (w%4)*3 + c)."""

    from megadetector_tpu.ops.preprocess_device import fold_canvas_h2

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(100, 200), (128, 128)]]
    staged, sizes = stage_images(imgs)

    planar = np.asarray(letterbox_batch(staged, sizes, 128))
    folded = np.asarray(letterbox_batch(staged, sizes, 128,
                                        fold_layout='h2'))
    assert folded.shape == (2, 64, 32, 24)

    # numpy reference of the model-side view
    ref = planar.reshape(2, 64, 2, 32, 12).transpose(0, 1, 3, 2, 4) \
        .reshape(2, 64, 32, 24)
    assert np.array_equal(folded, ref)

    # fold_canvas_h2 (the identity-path view) agrees element-by-element
    view = np.asarray(fold_canvas_h2(planar))
    assert np.array_equal(view, ref)
    # spot-check the channel order contract directly
    assert planar[0, 7, 4 * 5 + 2, 1] == ref[0, 3, 5, 1 * 12 + 2 * 3 + 1]


def test_batch_heterogeneous_sizes():
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(100, 200), (200, 100), (150, 150)]]
    staged, sizes = stage_images(imgs)
    out = np.asarray(letterbox_batch(staged, sizes, 128))
    assert out.shape == (3, 128, 128, 3)
    for i, im in enumerate(imgs):
        host, _, _ = box_ops.letterbox(im, (128, 128), auto=False,
                                       scaleup=True)
        diff = np.abs(out[i] * 255.0 - host.astype(np.float32))
        assert np.mean(diff) < 1.0
