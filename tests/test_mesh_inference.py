"""
Multi-device data-parallel INFERENCE tests on the 8-device virtual CPU
mesh: TPUDetector(mesh=...) must produce identical MD output to the
single-device path (host and device preprocess modes), and the batch
driver must auto-shard over all local devices.

Reference behavior being replaced: one-process-per-GPU sharding
(megadetector/detection/run_detector_batch.py:20-34); here the batch
axis is sharded over a jax.sharding.Mesh instead.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.parallel.mesh import make_data_mesh


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('mesh_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=3)
    path = str(folder / 'md_mesh_test.npz')
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
    folder = tmp_path_factory.mktemp('mesh_images')
    rng = np.random.RandomState(11)
    sizes = [(80, 60), (60, 80), (64, 64), (100, 40), (48, 48),
             (72, 96), (96, 72), (64, 96), (40, 100), (56, 56)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(folder / 'img_{:02d}.jpg'.format(i)))
    return str(folder)


def _detection_key(r):
    """Canonical form of one image result for cross-run comparison."""

    dets = r.get('detections')
    if dets is None:
        return (r['file'], None)
    return (r['file'],
            tuple(sorted((d['category'], d['conf'], tuple(d['bbox']))
                         for d in dets)))


def test_make_data_mesh_builds():
    import jax
    n = jax.local_device_count()
    assert n == 8, 'conftest must force 8 virtual CPU devices'
    mesh = make_data_mesh()
    assert mesh.devices.size == 8
    sub = make_data_mesh(4)
    assert sub.devices.size == 4


@pytest.mark.parametrize('preprocess_mode', ['host', 'device'])
def test_meshed_inference_matches_single_device(tiny_checkpoint,
                                                image_folder,
                                                preprocess_mode):
    from megadetector_tpu.models.detector import TPUDetector

    files = sorted(os.path.join(image_folder, f)
                   for f in os.listdir(image_folder))
    images = [np.asarray(Image.open(f).convert('RGB')) for f in files]

    single = TPUDetector(tiny_checkpoint, detector_options={
        'preprocess_mode': preprocess_mode})
    meshed = TPUDetector(tiny_checkpoint, detector_options={
        'preprocess_mode': preprocess_mode,
        'mesh': make_data_mesh(8),
        'pad_batches_to': 8})

    # Batch of 8 (one per device) plus a padded tail batch of 2
    r_single = single.generate_detections_one_batch(
        images, image_ids=files, detection_threshold=0.005)
    r_meshed = meshed.generate_detections_one_batch(
        images, image_ids=files, detection_threshold=0.005)

    assert len(r_single) == len(r_meshed) == len(files)
    for a, b in zip(r_single, r_meshed):
        assert _detection_key(a) == _detection_key(b)
    # Sanity: the model actually found something to compare
    assert any(r['detections'] for r in r_single)


def test_batch_driver_auto_meshes(tiny_checkpoint, image_folder, tmp_path):
    """
    With 8 local devices the driver must shard the batch axis over a mesh
    and still produce byte-identical output to an explicitly unmeshed run.
    """

    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch, write_results_to_file)
    from megadetector_tpu.models.detector import TPUDetector

    files = sorted(os.path.join(image_folder, f)
                   for f in os.listdir(image_folder))

    results_meshed = load_and_run_detector_batch(
        tiny_checkpoint, list(files), batch_size=4, quiet=True,
        detector_options={})
    results_plain = load_and_run_detector_batch(
        tiny_checkpoint, list(files), batch_size=4, quiet=True,
        detector_options={'use_mesh': 'false'})

    assert sorted(map(_detection_key, results_meshed)) == \
        sorted(map(_detection_key, results_plain))

    out_a = str(tmp_path / 'meshed.json')
    out_b = str(tmp_path / 'plain.json')
    write_results_to_file(results_meshed, out_a,
                          relative_path_base=image_folder,
                          detector_file=tiny_checkpoint)
    write_results_to_file(results_plain, out_b,
                          relative_path_base=image_folder,
                          detector_file=tiny_checkpoint)
    with open(out_a) as f:
        a = json.load(f)
    with open(out_b) as f:
        b = json.load(f)
    assert a['images'] == b['images']


def test_meshed_quantized_inference_matches_single(tmp_path):
    """int8-chain checkpoints over a mesh: the QConvParams static
    scales must survive replicated sharding, and results must be
    identical to the single-device quantized path."""

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint)
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=21)
    f_path = str(tmp_path / 'float.npz')
    save_checkpoint(params, f_path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    q_path = str(tmp_path / 'q.npz')
    quantize_checkpoint(f_path, q_path, calibration_image_size=64)

    rng = np.random.RandomState(3)
    images = [rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)
              for _ in range(8)]
    names = ['im_{}.jpg'.format(i) for i in range(8)]

    single = TPUDetector(q_path)
    meshed = TPUDetector(q_path, detector_options={
        'mesh': make_data_mesh(8), 'pad_batches_to': 8})

    r_single = single.generate_detections_one_batch(
        images, image_ids=names, detection_threshold=0.2)
    r_meshed = meshed.generate_detections_one_batch(
        images, image_ids=names, detection_threshold=0.2)

    for a, b in zip(r_single, r_meshed):
        assert a['detections'] is not None
        assert _detection_key(a) == _detection_key(b)
