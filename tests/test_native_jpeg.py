"""
Native JPEG decode + EXIF rotation + letterbox vs the PIL/python path.
Skipped when the native library can't build (no compiler / no libjpeg).
"""

import io

import numpy as np
import pytest
from PIL import Image

from megadetector_tpu import native

pytestmark = pytest.mark.skipif(
    not native.jpeg_loader_available(),
    reason='native JPEG loader unavailable')


def _jpeg_bytes(arr, quality=95, exif_orientation=None):
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    kwargs = {'quality': quality}
    if exif_orientation is not None:
        exif = Image.Exif()
        exif[274] = exif_orientation
        kwargs['exif'] = exif.tobytes()
    img.save(buf, format='JPEG', **kwargs)
    return buf.getvalue()


def _smooth_image(h, w, seed=0):
    """Low-frequency test image (JPEG-friendly, small codec error)."""

    rng = np.random.RandomState(seed)
    yy = np.linspace(0, np.pi * 2, h)[:, None, None]
    xx = np.linspace(0, np.pi * 3, w)[None, :, None]
    phases = rng.uniform(0, np.pi, (1, 1, 3))
    img = (np.sin(yy + phases) * np.cos(xx - phases) + 1) * 127.0
    return img.astype(np.uint8)


def test_decode_matches_pil():
    arr = _smooth_image(240, 320)
    data = _jpeg_bytes(arr)

    canvas, (h, w) = native.decode_jpeg_letterbox(data, 320)
    assert (h, w) == (240, 320)

    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    ref = native.letterbox_u8(pil, 320)
    # Same letterbox geometry; decode differences are libjpeg-vs-PIL
    # rounding, bounded to a couple of levels on smooth content
    diff = np.abs(canvas.astype(int) - ref.astype(int))
    assert diff.max() <= 3
    assert diff.mean() < 0.5


@pytest.mark.parametrize('orientation', [3, 6, 8])
def test_exif_rotation_matches_pil(orientation):
    arr = _smooth_image(120, 200, seed=orientation)
    data = _jpeg_bytes(arr, exif_orientation=orientation)

    canvas, (h, w) = native.decode_jpeg_letterbox(data, 256)

    # PIL reference path: decode, rotate as visualization_utils does
    rotations = {3: 180, 6: 270, 8: 90}
    pil = Image.open(io.BytesIO(data)).convert('RGB')
    pil = pil.rotate(rotations[orientation], expand=True)
    ref_arr = np.asarray(pil)
    assert (h, w) == ref_arr.shape[:2]
    ref = native.letterbox_u8(ref_arr, 256)
    diff = np.abs(canvas.astype(int) - ref.astype(int))
    assert diff.max() <= 3


def test_mirrored_orientation_rejected():
    arr = _smooth_image(64, 64)
    data = _jpeg_bytes(arr, exif_orientation=2)
    with pytest.raises(ValueError):
        native.decode_jpeg_letterbox(data, 128)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        native.decode_jpeg_letterbox(b'not a jpeg at all', 128)


def test_batch_decode_with_failures():
    imgs = [_smooth_image(100, 150, seed=i) for i in range(3)]
    buffers = [_jpeg_bytes(a) for a in imgs]
    buffers.insert(1, b'garbage')

    staging, dims, errs = native.decode_jpeg_letterbox_batch(buffers, 192)
    assert staging.shape == (4, 192, 192, 3)
    assert errs[1] != 0
    assert errs[0] == 0 and errs[2] == 0 and errs[3] == 0
    assert tuple(dims[0]) == (100, 150)

    # Each successful slot matches the single-image API
    one, _ = native.decode_jpeg_letterbox(buffers[0], 192)
    np.testing.assert_array_equal(staging[0], one)


def test_batch_reuses_staging_buffer():
    imgs = [_smooth_image(80, 80, seed=9)]
    buffers = [_jpeg_bytes(imgs[0])]
    out = np.zeros((1, 128, 128, 3), dtype=np.uint8)
    staging, _, errs = native.decode_jpeg_letterbox_batch(
        buffers, 128, out=out)
    assert staging is out
    assert errs[0] == 0
    assert out.any()


def test_dct_scaled_decode_close():
    """Performance mode: scaled decode of a large image stays visually
    equivalent after letterboxing to a much smaller canvas."""

    arr = _smooth_image(1200, 1600, seed=4)
    data = _jpeg_bytes(arr)
    full, _ = native.decode_jpeg_letterbox(data, 320, dct_scale_target=0)
    fast, _ = native.decode_jpeg_letterbox(data, 320,
                                           dct_scale_target=480)
    diff = np.abs(full.astype(int) - fast.astype(int))
    assert diff.mean() < 2.0


def test_batch_driver_native_loader_end_to_end(tmp_path):
    """run_detector_batch with use_native_loader=True produces the same
    detections as the default PIL/cv2 loader (native full decode is
    within 1 gray level of PIL; random-weight detections at a confident
    threshold must agree)."""

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch)

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=11)
    model = str(tmp_path / 'model.npz')
    save_checkpoint(params, model, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 192, 'anchors': cfg.anchors.tolist()})

    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    for i in range(3):
        arr = _smooth_image(200 + 40 * i, 300 - 20 * i, seed=i)
        Image.fromarray(arr).save(str(img_dir / 'im_{}.jpg'.format(i)),
                                  quality=95)
    files = sorted(str(p) for p in img_dir.glob('*.jpg'))

    common = dict(confidence_threshold=0.2, batch_size=2, quiet=True,
                  detector_options={'force_cpu': 'true'})
    got = load_and_run_detector_batch(model, list(files),
                                      use_native_loader=True, **common)

    # Pipeline contract: every image succeeds through the native loader
    # and produces well-formed detections
    assert len(got) == len(files)
    for r in got:
        assert r.get('failure') is None
        assert r['detections'] is not None
        for d in r['detections']:
            assert 0.0 <= min(d['bbox']) and max(d['bbox']) <= 1.0 + 1e-6

    # Pixel contract: the canvas the native loader feeds the detector
    # matches the Python loader's within one gray level (random-weight
    # detections near-tie under a 1-level pixel change, so detections
    # are compared at canvas level — the detector-on-canvas step is
    # deterministic and covered by the detector e2e tests)
    from megadetector_tpu.detection._loader_worker import (
        load_and_letterbox)
    for f in files:
        _, nat = load_and_letterbox((f, 192, 32, 'classic', 'host',
                                     None, True))
        _, ref = load_and_letterbox((f, 192, 32, 'classic', 'host',
                                     None, False))
        assert not isinstance(nat, str) and not isinstance(ref, str)
        assert nat['img_original'] is None  # really took the native path
        diff = np.abs(nat['img_processed'].astype(int) -
                      ref['img_processed'].astype(int))
        assert diff.max() <= 2
        assert nat['letterbox_ratio'] == pytest.approx(
            ref['letterbox_ratio'])
        assert tuple(nat['letterbox_pad']) == pytest.approx(
            tuple(ref['letterbox_pad']))
        assert tuple(nat['scaling_shape']) == tuple(ref['scaling_shape'])


def test_decode_jpeg_scaled_full_resolution():
    """decode_jpeg_scaled at target 0 == PIL full decode (modulo codec
    rounding)."""

    arr = _smooth_image(240, 320)
    data = _jpeg_bytes(arr)
    out = native.decode_jpeg_scaled(data, dct_scale_target=0)
    assert out.shape == (240, 320, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    diff = np.abs(out.astype(int) - pil.astype(int))
    assert diff.max() <= 2


def test_decode_jpeg_scaled_dct():
    """DCT-scaled decode lands at the predicted ceil(dim*num/8) size,
    with the long side covering the target."""

    arr = _smooth_image(1200, 1600, seed=3)
    data = _jpeg_bytes(arr)
    out = native.decode_jpeg_scaled(data, dct_scale_target=640)
    h, w = native.scaled_decode_dims(1600, 1200, 640)
    assert out.shape == (h, w, 3)
    assert max(h, w) >= 640
    assert max(h, w) < 1600  # actually scaled down
    # Content matches a box-downsampled original loosely
    import cv2
    ref = cv2.resize(arr, (w, h), interpolation=cv2.INTER_AREA)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.mean() < 6.0


def test_decode_jpeg_scaled_rotation():
    arr = _smooth_image(120, 200, seed=5)
    data = _jpeg_bytes(arr, exif_orientation=6)
    out = native.decode_jpeg_scaled(data)
    assert out.shape == (200, 120, 3)  # dims swapped by rotation


def test_device_mode_native_loader(tmp_path):
    """Device-preprocess staging via native DCT-scaled decode: the
    loader info feeds the standard device path, and detections agree
    loosely with the PIL device path (DCT decode is a documented perf
    deviation)."""

    from megadetector_tpu.detection._loader_worker import \
        load_and_letterbox
    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.models.detector import TPUDetector

    rng = np.random.RandomState(2)
    arr = _smooth_image(600, 800, seed=2)
    fn = str(tmp_path / 'big.jpg')
    Image.fromarray(arr).save(fn, quality=95)

    _, info = load_and_letterbox(
        (fn, 128, 32, 'classic', 'device', None, True, 'auto'))
    assert not isinstance(info, str)
    assert info['img_processed'] is None
    # DCT-scaled decode landed near the inference size, not at 600x800
    assert max(info['img_original'].shape[:2]) < 600
    assert max(info['img_original'].shape[:2]) >= 128
    assert info['target_shape'][0] != info['target_shape'][1]  # 4:3 rect

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(tmp_path / 'm.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=9), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 128, 'anchors': cfg.anchors.tolist()})
    det = TPUDetector(path, detector_options={
        'preprocess_mode': 'device'})

    r_native = det.generate_detections_one_batch(
        [info], [fn], detection_threshold=0.2)[0]
    r_pil = det.generate_detections_one_image(
        np.asarray(Image.open(fn).convert('RGB')), fn,
        detection_threshold=0.2)
    assert r_native['detections'] is not None
    assert r_pil['detections'] is not None
    # Loose agreement: top-confidence within 0.05
    top_n = max((d['conf'] for d in r_native['detections']), default=0)
    top_p = max((d['conf'] for d in r_pil['detections']), default=0)
    assert abs(top_n - top_p) < 0.05
