"""
End-to-end pipeline tests with a tiny random-weight checkpoint: detector
API, batch driver, checkpointing/resume, and the MD output format contract.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    """A yolov5n checkpoint with a 64px canvas, random weights."""

    folder = tmp_path_factory.mktemp('model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(folder / 'md_test.npz')
    save_checkpoint(params, path, {
        'metadata_format_version': 1.0,
        'model_version_string': 'v5a.0.1',
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64,
        'strides': [8, 16, 32],
        'anchors': cfg.anchors.tolist(),
    })
    return path


@pytest.fixture(scope='module')
def image_folder(tmp_path_factory):
    """A folder of small synthetic JPEGs (including a corrupt one)."""

    folder = tmp_path_factory.mktemp('images')
    rng = np.random.RandomState(0)
    sizes = [(80, 60), (60, 80), (64, 64), (100, 40)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(folder / 'img_{}.jpg'.format(i)))
    sub = folder / 'camera2'
    sub.mkdir()
    Image.fromarray(rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)) \
        .save(str(sub / 'img_sub.jpg'))
    # A corrupt file that should produce a failure record
    with open(str(folder / 'corrupt.jpg'), 'wb') as f:
        f.write(b'not actually a jpeg')
    return str(folder)


@pytest.fixture(scope='module')
def detector(tiny_checkpoint):
    from megadetector_tpu.models.detector import TPUDetector
    return TPUDetector(tiny_checkpoint)


def test_detector_single_image(detector):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    result = detector.generate_detections_one_image(
        img, 'test.jpg', detection_threshold=0.005)
    assert result['file'] == 'test.jpg'
    assert result['detections'] is not None
    for det in result['detections']:
        assert det['category'] in ('1', '2', '3')
        assert 0 <= det['conf'] <= 1
        x, y, w, h = det['bbox']
        assert -0.001 <= x <= 1.001 and -0.001 <= y <= 1.001
        assert w >= 0 and h >= 0
        assert x + w <= 1.001 and y + h <= 1.001
        # Classic mode truncates to fixed digits
        assert det['conf'] == round(det['conf'], 3)


def test_detector_batch_matches_single(detector):
    """Batch inference must agree with single-image inference."""

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
            for _ in range(3)]
    singles = [detector.generate_detections_one_image(
        im, 'im{}.jpg'.format(i), detection_threshold=0.1)
        for i, im in enumerate(imgs)]
    batch = detector.generate_detections_one_batch(
        imgs, ['im{}.jpg'.format(i) for i in range(3)],
        detection_threshold=0.1)
    for s, b in zip(singles, batch):
        assert s['file'] == b['file']
        assert len(s['detections']) == len(b['detections'])
        for ds, db in zip(s['detections'], b['detections']):
            assert ds['category'] == db['category']
            assert ds['conf'] == pytest.approx(db['conf'], abs=1e-3)
            assert ds['bbox'] == pytest.approx(db['bbox'], abs=2e-3)


def test_detector_pil_input(detector):
    img = Image.fromarray(
        np.random.RandomState(3).randint(0, 255, (60, 80, 3),
                                         dtype=np.uint8))
    result = detector.generate_detections_one_image(img, 'pil.jpg',
                                                    detection_threshold=0.1)
    assert result['detections'] is not None


def test_batch_driver_end_to_end(tiny_checkpoint, image_folder, tmp_path):
    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch, write_results_to_file)
    from megadetector_tpu.utils.path_utils import find_images

    images = find_images(image_folder, recursive=True)
    assert len(images) == 6  # 5 good + 1 corrupt

    results = load_and_run_detector_batch(
        tiny_checkpoint, images, quiet=True, batch_size=4)
    assert len(results) == 6

    by_file = {r['file']: r for r in results}
    corrupt = [r for r in results if 'corrupt' in r['file']][0]
    assert corrupt['detections'] is None
    assert corrupt['failure'] == 'image access failure'
    good = [r for r in results if 'corrupt' not in r['file']]
    assert all(r['detections'] is not None for r in good)

    # Write and validate the output format
    output_file = str(tmp_path / 'results.json')
    write_results_to_file(results, output_file,
                          relative_path_base=image_folder,
                          detector_file='md_v5a.0.1.pt')
    with open(output_file) as f:
        data = json.load(f)

    assert data['info']['format_version'] == '1.6'
    assert data['info']['detector'] == 'md_v5a.0.1.pt'
    assert data['detection_categories'] == {
        '1': 'animal', '2': 'person', '3': 'vehicle'}
    assert len(data['images']) == 6
    files = [im['file'] for im in data['images']]
    assert files == sorted(files)
    assert all('/' not in f or '\\' not in f for f in files)
    for im in data['images']:
        assert 'max_detection_conf' not in im
        if im['detections'] is None:
            assert 'failure' in im
        else:
            confs = [d['conf'] for d in im['detections']]
            assert confs == sorted(confs, reverse=True)


def test_checkpoint_resume(tiny_checkpoint, image_folder, tmp_path):
    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch, write_checkpoint, load_checkpoint)
    from megadetector_tpu.utils.path_utils import find_images

    images = find_images(image_folder, recursive=True)
    checkpoint_path = str(tmp_path / 'md_checkpoint_test.json')

    # Simulate a partial run: first 2 images processed
    partial = load_and_run_detector_batch(
        tiny_checkpoint, images[:2], quiet=True, batch_size=2)
    write_checkpoint(checkpoint_path, partial)

    restored = load_checkpoint(checkpoint_path)
    assert len(restored) == 2

    # Resume: only remaining images get processed
    results = load_and_run_detector_batch(
        tiny_checkpoint, images, results=restored, quiet=True,
        batch_size=4, checkpoint_path=checkpoint_path,
        checkpoint_frequency=2)
    assert len(results) == len(images)
    assert len(set(r['file'] for r in results)) == len(images)


def test_checkpoint_backup_semantics(tmp_path):
    from megadetector_tpu.detection.run_detector_batch import (
        write_checkpoint, load_checkpoint)

    path = str(tmp_path / 'ckpt.json')
    write_checkpoint(path, [{'file': 'a.jpg', 'detections': []}])
    write_checkpoint(path, [{'file': 'a.jpg', 'detections': []},
                            {'file': 'b.jpg', 'detections': []}])
    assert len(load_checkpoint(path)) == 2
    assert not os.path.exists(path + '_tmp')


def test_process_pool_loader(tiny_checkpoint, image_folder):
    """The multiprocessing loader mode produces the same results as the
    thread loader."""

    from megadetector_tpu.detection.run_detector_batch import \
        load_and_run_detector_batch
    from megadetector_tpu.utils.path_utils import find_images

    images = find_images(image_folder, recursive=True)
    thread_results = load_and_run_detector_batch(
        tiny_checkpoint, images, quiet=True, batch_size=4)
    process_results = load_and_run_detector_batch(
        tiny_checkpoint, images, quiet=True, batch_size=4,
        loader_pool_type='process', loader_workers=2)
    assert len(thread_results) == len(process_results)
    t_by_file = {r['file']: r for r in thread_results}
    p_by_file = {r['file']: r for r in process_results}
    for fn in t_by_file:
        t = t_by_file[fn]
        p = p_by_file[fn]
        if t['detections'] is None:
            assert p['detections'] is None
        else:
            assert len(t['detections']) == len(p['detections'])


def test_batch_padding_single_compile(tiny_checkpoint):
    """Tail batches pad to the compiled size: only one program compiles."""

    import numpy as np
    from megadetector_tpu.models.detector import TPUDetector
    detector = TPUDetector(tiny_checkpoint, {'pad_batches_to': 4})
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
            for _ in range(3)]
    out = detector.generate_detections_one_batch(
        imgs, ['a', 'b', 'c'], detection_threshold=0.1)
    assert len(out) == 3
    assert all(r['detections'] is not None for r in out)
    # Exactly one compiled program, keyed on the padded batch size
    assert len(detector._compiled) == 1
    assert list(detector._compiled)[0][0] == 4


def test_programming_error_surfaces_not_masked(tiny_checkpoint):
    """Round 4 shipped an AttributeError masked as per-batch 'inference
    failure' records for most of the round (commit ce6e5f4). Bug-shaped
    exceptions from our own dispatch code must re-raise under pytest /
    MD_STRICT_FAILURES instead of being contained as data failures."""

    from megadetector_tpu.models.detector import TPUDetector

    detector = TPUDetector(tiny_checkpoint)
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)]

    def broken_run_batch(*args, **kwargs):
        raise AttributeError("'TPUDetector' object has no attribute "
                             "'_deliberately_missing'")

    detector._run_batch = broken_run_batch
    with pytest.raises(AttributeError):
        detector.generate_detections_one_batch(
            imgs, ['x.jpg'], detection_threshold=0.1)

    # Data-shaped exceptions stay contained (the reference contract:
    # run_detector.py:54-56 failure records, pytorch_detector.py's
    # per-batch containment)
    def broken_data(*args, **kwargs):
        raise ValueError('simulated device data fault')

    detector._run_batch = broken_data
    out = detector.generate_detections_one_batch(
        imgs, ['x.jpg'], detection_threshold=0.1)
    assert out[0]['failure'] == 'inference failure'
    assert out[0]['detections'] is None


def test_strict_mode_disables_bf16_resize(tiny_checkpoint):
    """classic-strict promises bit-level reproduction of the
    unoptimized graph; the bf16 device-letterbox resize (a
    numerics-changing fast path) must be off there, on for plain
    classic bf16 detectors, and opt-out-able via bf16_resize."""

    import jax.numpy as jnp
    from megadetector_tpu.models.detector import TPUDetector

    strict = TPUDetector(tiny_checkpoint, detector_options={
        'dtype': 'bfloat16', 'compatibility_mode': 'classic-strict'})
    assert strict._resize_dtype() is None

    fast = TPUDetector(tiny_checkpoint,
                       detector_options={'dtype': 'bfloat16'})
    assert fast._resize_dtype() == jnp.bfloat16

    opted_out = TPUDetector(tiny_checkpoint, detector_options={
        'dtype': 'bfloat16', 'bf16_resize': 'false'})
    assert opted_out._resize_dtype() is None

    f32 = TPUDetector(tiny_checkpoint)
    assert f32._resize_dtype() is None


def test_xla_compiler_options_plumbing(tiny_checkpoint):
    """xla_compiler_options parses (string and dict forms), keys the
    process-global program cache (detectors differing only in flags
    must not share programs), reaches the compiled program (results
    identical for a semantically-neutral flag), is ignored in strict
    mode, and rejects malformed items."""

    import pytest as _pytest

    from megadetector_tpu.models.detector import (
        TPUDetector, _parse_compiler_options)

    # Parse forms
    assert _parse_compiler_options(None) is None
    assert _parse_compiler_options('') is None
    assert _parse_compiler_options('a=1') == {'a': '1'}
    assert _parse_compiler_options('a=true;b=False') == \
        {'a': True, 'b': False}
    assert _parse_compiler_options(' a=1; b=x=y ;') == \
        {'a': '1', 'b': 'x=y'}
    assert _parse_compiler_options({'a': 1}) == {'a': '1'}
    with _pytest.raises(ValueError):
        _parse_compiler_options('no_separator_here')

    # A real generic XLA flag at its default value: the program must
    # compile and run through the flagged path with identical results.
    flag = 'xla_cpu_enable_fast_math=false'
    base = TPUDetector(tiny_checkpoint)
    flagged = TPUDetector(tiny_checkpoint, detector_options={
        'xla_compiler_options': flag})
    assert flagged._compiler_options == \
        {'xla_cpu_enable_fast_math': False}
    assert base._compiler_key() is None
    assert flagged._compiler_key() == \
        (('xla_cpu_enable_fast_math', False),)

    img = Image.fromarray(
        np.random.RandomState(3).randint(0, 255, (64, 64, 3),
                                         dtype=np.uint8))
    r_base = base.generate_detections_one_image(img, 'im',
                                                detection_threshold=0.005)
    r_flag = flagged.generate_detections_one_image(
        img, 'im', detection_threshold=0.005)
    assert r_base['detections'] == r_flag['detections']
    # Distinct cached programs (same shapes, different flags)
    assert base._get_compiled(1, 64, 64) is not flagged._get_compiled(
        1, 64, 64)

    # Strict mode ignores the option entirely
    strict = TPUDetector(tiny_checkpoint, detector_options={
        'compatibility_mode': 'classic-strict',
        'xla_compiler_options': flag})
    assert strict._compiler_options is None


def test_xla_compiler_options_bad_flag_fails_fast(tiny_checkpoint):
    """An invalid compiler flag must raise at construction with a clear
    message, not surface later as contained per-image failures."""

    from megadetector_tpu.models.detector import TPUDetector

    with pytest.raises(ValueError, match='xla_compiler_options'):
        TPUDetector(tiny_checkpoint, detector_options={
            'xla_compiler_options':
                'xla_no_such_flag_exists_anywhere=1'})
