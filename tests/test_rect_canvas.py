"""
Aspect-bucketed rectangular canvas tests (canvas_mode='auto', the
production default): per-image minimal stride-rectangle letterboxing
exactly like the reference (pytorch_detector.py:1064-1068), shape-grouped
batching (:1228-1251), the max_canvases compile-guard, and the native
loader's header-based rect path.
"""

import os

import numpy as np
import pytest
from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.models.detector import TPUDetector


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('rect_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(folder / 'rect_test.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=7), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 128, 'anchors': cfg.anchors.tolist()})
    return path


def _detection_key(r):
    dets = r.get('detections')
    if dets is None:
        return (r['file'], None)
    return (r['file'],
            tuple(sorted((d['category'], d['conf'], tuple(d['bbox']))
                         for d in dets)))


def test_auto_target_shape_matches_letterbox():
    """The predicted canvas must equal what letterbox(auto=True)
    actually produces, for every plausible aspect ratio."""

    from megadetector_tpu.ops import boxes as box_ops

    det = TPUDetector.__new__(TPUDetector)
    det.letterbox_stride = 64
    rng = np.random.RandomState(0)
    shapes = [(1536, 2048), (2048, 1536), (1080, 1920), (333, 517),
              (64, 64), (4000, 3000), (100, 1000)]
    shapes += [(int(rng.randint(50, 4000)), int(rng.randint(50, 4000)))
               for _ in range(20)]
    for (h, w) in shapes:
        img = np.zeros((h, w, 3), np.uint8)
        out, _, _ = box_ops.letterbox(
            img, new_shape=(1280, 1280), stride=64, auto=True,
            scaleup=True)
        predicted = det._auto_target_shape((h, w), 1280)
        assert out.shape[:2] == predicted, (h, w, out.shape, predicted)


@pytest.mark.parametrize('preprocess_mode', ['host', 'device'])
def test_mixed_aspect_batch_matches_single(checkpoint, preprocess_mode):
    """One generate_detections_one_batch call over mixed aspect ratios
    (landscape + portrait + square) must shape-group internally and
    produce exactly the per-image results."""

    det = TPUDetector(checkpoint, detector_options={
        'preprocess_mode': preprocess_mode})
    assert det.canvas_mode == 'auto'

    rng = np.random.RandomState(5)
    sizes = [(160, 120), (120, 160), (128, 128), (200, 80), (90, 150)]
    images = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
              for (h, w) in sizes]
    names = ['m_{}.jpg'.format(i) for i in range(len(images))]

    batched = det.generate_detections_one_batch(
        images, image_ids=names, detection_threshold=0.005)
    singles = [det.generate_detections_one_image(
        img, name, detection_threshold=0.005)
        for img, name in zip(images, names)]

    for a, b in zip(batched, singles):
        assert _detection_key(a) == _detection_key(b)
    assert any(r['detections'] for r in batched)
    # The run really used more than one canvas shape
    canvases = {tuple(det.preprocess_image(img)['target_shape'])
                for img in images}
    assert len(canvases) > 1
    assert any(c[0] != c[1] for c in canvases)


def test_max_canvases_guard(checkpoint):
    """Beyond max_canvases distinct auto shapes, new shapes fall back
    to the square canvas instead of compiling more programs."""

    det = TPUDetector(checkpoint, detector_options={'max_canvases': 1})
    rng = np.random.RandomState(1)
    # Aspect ratios that produce three different minimal rectangles
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(120, 160), (160, 120), (60, 160)]]
    shapes = [tuple(det.preprocess_image(img)['target_shape'])
              for img in imgs]
    assert len(det._auto_canvases) == 1
    # First non-square shape kept, later new shapes fell back to square
    assert shapes[0][0] != shapes[0][1]
    assert shapes[1] == (128, 128)
    assert shapes[2] == (128, 128)
    # A repeat of the first shape still uses its rect bucket
    again = tuple(det.preprocess_image(imgs[0])['target_shape'])
    assert again == shapes[0]


def test_square_mode_unchanged(checkpoint):
    """canvas_mode='square' still letterboxes everything to the full
    canvas."""

    det = TPUDetector(checkpoint,
                      detector_options={'canvas_mode': 'square'})
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (90, 160, 3), dtype=np.uint8)
    info = det.preprocess_image(img)
    assert tuple(info['target_shape']) == (128, 128)


def test_batch_driver_bucket_packing(checkpoint, tmp_path):
    """The batch driver packs per-canvas buckets; results must be
    identical to single-image inference regardless of arrival order."""

    from megadetector_tpu.detection.run_detector_batch import \
        load_and_run_detector_batch

    folder = tmp_path / 'imgs'
    folder.mkdir()
    rng = np.random.RandomState(9)
    sizes = [(160, 120), (120, 160), (128, 128), (160, 120), (120, 160),
             (160, 120), (90, 150), (128, 128), (160, 120), (120, 160)]
    files = []
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        fn = str(folder / 'img_{:02d}.png'.format(i))
        Image.fromarray(arr).save(fn)
        files.append(fn)

    det = TPUDetector(checkpoint, detector_options={'use_mesh': 'false'})
    results = load_and_run_detector_batch(
        det, list(files), batch_size=4, quiet=True,
        detector_options={'use_mesh': 'false'})

    from megadetector_tpu.visualization import visualization_utils as vu
    singles = {}
    for fn in files:
        img = vu.load_image(fn)
        singles[fn] = det.generate_detections_one_image(
            img, fn, detection_threshold=0.005)

    assert len(results) == len(files)
    for r in results:
        assert _detection_key(r) == _detection_key(singles[r['file']])


def test_native_loader_rect(checkpoint, tmp_path):
    """The native JPEG loader's auto-canvas path: header-derived rect
    canvas, geometry bookkeeping consistent with the Python letterbox."""

    from megadetector_tpu import native
    if not native.jpeg_loader_available():
        pytest.skip('native JPEG loader unavailable')

    from megadetector_tpu.detection._loader_worker import load_and_letterbox

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    fn = str(tmp_path / 'rect.jpg')
    Image.fromarray(arr).save(fn, quality=95)

    _, info_native = load_and_letterbox(
        (fn, 128, 32, 'classic', 'host', None, True, 'auto'))
    _, info_python = load_and_letterbox(
        (fn, 128, 32, 'classic', 'host', None, False, 'auto'))

    assert not isinstance(info_native, str)
    assert tuple(info_native['target_shape']) == \
        tuple(info_python['target_shape'])
    assert info_native['target_shape'][0] != info_native['target_shape'][1]
    assert info_native['letterbox_pad'] == info_python['letterbox_pad']
    # Decode rounding differs by a few levels (documented perf mode)
    diff = np.abs(info_native['img_processed'].astype(int) -
                  info_python['img_processed'].astype(int))
    assert diff.mean() < 3.0


def test_device_identity_fast_path(checkpoint):
    """When every image's content equals the canvas (ratio exactly 1 —
    the DCT-scaled-decode common case), the device-preprocess program
    skips the resize stage; results must be identical to the full
    letterbox program on the same batch."""

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)

    det = TPUDetector(checkpoint, detector_options={
        'preprocess_mode': 'device', 'use_mesh': 'false'})
    r_fast = det.generate_detections_one_batch(
        [img.copy()], ['a.jpg'], detection_threshold=0.01)

    # identity program was compiled and used
    assert any(k[0] == 'dev' and k[-1] is True
               for k in det._compiled), list(det._compiled)

    # force the full letterbox program on the same batch
    det2 = TPUDetector(checkpoint, detector_options={
        'preprocess_mode': 'device', 'use_mesh': 'false'})
    orig = det2._get_compiled_device_preprocess

    def no_identity(*args, **kwargs):
        kwargs['identity'] = False
        return orig(*args, **kwargs)

    det2._get_compiled_device_preprocess = no_identity
    r_full = det2.generate_detections_one_batch(
        [img.copy()], ['a.jpg'], detection_threshold=0.01)
    assert all(k[-1] is False for k in det2._compiled
               if k[0] == 'dev')

    assert _detection_key(r_fast[0]) == _detection_key(r_full[0])


def test_device_identity_not_taken_when_resize_needed(checkpoint):
    """Content smaller than the canvas must keep the letterbox
    program (and still produce detections for the content region)."""

    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (90, 120, 3), dtype=np.uint8)
    det = TPUDetector(checkpoint, detector_options={
        'preprocess_mode': 'device', 'use_mesh': 'false'})
    r = det.generate_detections_one_batch(
        [img], ['b.jpg'], detection_threshold=0.01)
    assert r[0].get('failure') is None
    assert all(k[-1] is False for k in det._compiled if k[0] == 'dev')
