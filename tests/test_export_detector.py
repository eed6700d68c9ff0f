"""
AOT detector export: serialize compiled programs to an .mdpkg artifact,
reload with no checkpoint/model code, and verify the exported pipeline
matches the live detector (detection/export_detector.py).
"""

import os
import zipfile

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import md_tests as comparator

IMAGE_SIZE = 256  # 4:3 sources get a real 192x256 rect canvas at stride 64


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('export_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=11)
    path = str(folder / 'md_export_test.npz')
    save_checkpoint(params, path, {
        'metadata_format_version': 1.0,
        'model_version_string': 'v5a.0.1',
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
        'strides': [8, 16, 32],
        'anchors': cfg.anchors.tolist(),
    })
    return path


@pytest.fixture(scope='module')
def artifact(tiny_checkpoint, tmp_path_factory):
    from megadetector_tpu.detection.export_detector import export_detector
    out = str(tmp_path_factory.mktemp('export_out') / 'model.mdpkg')
    manifest = export_detector(
        tiny_checkpoint, out, batch_sizes=[2], aspects=['4:3'])
    return out, manifest


def _test_images():
    rng = np.random.RandomState(3)
    return [
        rng.randint(0, 255, (240, 320, 3), dtype=np.uint8),  # 4:3 rect
        rng.randint(0, 255, (300, 400, 3), dtype=np.uint8),  # 4:3 rect
        rng.randint(0, 255, (200, 200, 3), dtype=np.uint8),  # square
        rng.randint(0, 255, (100, 330, 3), dtype=np.uint8),  # odd aspect
    ]


def _assert_matching(results_a, results_b):
    assert len(results_a) == len(results_b)
    for a, b in zip(results_a, results_b):
        assert a['file'] == b['file']
        res = comparator.compare_detection_lists(
            a['detections'], b['detections'], image_id=a['file'])
        assert not res['errors'], res['errors']


def test_manifest_and_programs(artifact):
    path, manifest = artifact
    assert manifest['image_size'] == IMAGE_SIZE
    assert [192, 256] in manifest['canvases']
    assert [IMAGE_SIZE, IMAGE_SIZE] in manifest['canvases']
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert 'manifest.json' in names
    # one program per (batch, canvas, capacity)
    assert len([n for n in names if n.startswith('programs/')]) == 2


def test_exported_matches_live(tiny_checkpoint, artifact):
    from megadetector_tpu.detection.run_detector import load_detector

    # Random weights push thousands of candidates above the floor; pin
    # the live detector to the exported capacity so both pipelines use
    # the identical 512-candidate selection program
    live = load_detector(tiny_checkpoint,
                         detector_options={'auto_escalate_topk': False})
    exported = load_detector(artifact[0])

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    assert isinstance(exported, ExportedDetector)

    images = _test_images()
    ids = ['img_{}.jpg'.format(i) for i in range(len(images))]
    live_results = live.generate_detections_one_batch(
        images, ids, detection_threshold=0.005)
    exported_results = exported.generate_detections_one_batch(
        images, ids, detection_threshold=0.005)

    # Parity holds on the exported canvases (4:3 rect + square). img_3's
    # minimal rect was not exported, so it letterboxes onto the square
    # canvas instead — by design a different program than the live
    # detector picks, which random near-tie weights amplify; check it
    # structurally only.
    _assert_matching(live_results[:3], exported_results[:3])
    assert exported_results[3]['detections'] is not None

    # At least one image must have detections for this to mean anything
    assert any(r['detections'] for r in live_results[:3])


def test_oversized_batch_chunks(artifact):
    """Groups larger than the exported batch size chunk transparently."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    rng = np.random.RandomState(4)
    images = [rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
              for _ in range(5)]
    results = detector.generate_detections_one_batch(
        images, ['b{}.jpg'.format(i) for i in range(5)],
        detection_threshold=0.005)
    assert len(results) == 5
    assert all(r['detections'] is not None for r in results)
    singles = [detector.generate_detections_one_image(
        img, 'b{}.jpg'.format(i), detection_threshold=0.005)
        for i, img in enumerate(images)]
    _assert_matching(singles, results)


def test_unlisted_aspect_falls_back_to_square(artifact):
    """An image whose minimal rect canvas was not exported letterboxes
    onto the square canvas instead of failing."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    info = detector.preprocess_image(
        np.zeros((100, 330, 3), dtype=np.uint8), 'wide.jpg')
    assert tuple(info['target_shape']) == (IMAGE_SIZE, IMAGE_SIZE)


def test_augment_rejected(artifact):
    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    with pytest.raises(Exception):
        detector.generate_detections_one_image(
            np.zeros((64, 64, 3), dtype=np.uint8), 'x.jpg', augment=True)


def test_fixed_options_rejected(artifact):
    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    with pytest.raises(AssertionError):
        ExportedDetector(artifact[0],
                         detector_options={'image_size': 640})
    # every trace-time-fixed option must be refused, including the
    # round-5 bottleneck_variant (cannot take effect on precompiled
    # programs)
    with pytest.raises(AssertionError):
        ExportedDetector(artifact[0],
                         detector_options={'bottleneck_variant':
                                           'im2col'})


def test_failure_containment(artifact):
    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    results = detector.generate_detections_one_batch(
        [None], ['missing.jpg'], detection_threshold=0.005)
    assert results[0]['detections'] is None
    assert 'failure' in results[0]


def test_corrupt_program_rejected(artifact, tmp_path):
    """A tampered serialized program must never reach the compiler."""

    from megadetector_tpu.detection.export_detector import (
        ExportedDetector, MANIFEST_NAME)
    tampered = str(tmp_path / 'tampered.mdpkg')
    with zipfile.ZipFile(artifact[0]) as src, \
            zipfile.ZipFile(tampered, 'w') as dst:
        for name in src.namelist():
            blob = src.read(name)
            if name != MANIFEST_NAME and name.endswith('.stablehlo'):
                blob = blob[:-1] + bytes([blob[-1] ^ 0xFF])
            dst.writestr(name, blob)
    with pytest.raises(ValueError, match='sha256 mismatch'):
        ExportedDetector(tampered)


def test_unhashed_program_rejected(artifact, tmp_path):
    """Integrity must be two-sided: a program without a manifest hash
    is tampering, not a pass."""

    import json
    from megadetector_tpu.detection.export_detector import (
        ExportedDetector, MANIFEST_NAME)
    stripped = str(tmp_path / 'unhashed.mdpkg')
    with zipfile.ZipFile(artifact[0]) as src, \
            zipfile.ZipFile(stripped, 'w') as dst:
        for name in src.namelist():
            blob = src.read(name)
            if name == MANIFEST_NAME:
                manifest = json.loads(blob)
                hashes = manifest['program_sha256']
                hashes.pop(sorted(hashes)[0])
                blob = json.dumps(manifest)
            dst.writestr(name, blob)
    with pytest.raises(ValueError, match='no integrity hash'):
        ExportedDetector(stripped)


def test_missing_program_rejected(artifact, tmp_path):
    """A manifest-listed program absent from the archive must fail at
    load, not as a confusing per-batch inference failure later."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    truncated = str(tmp_path / 'missing.mdpkg')
    with zipfile.ZipFile(artifact[0]) as src, \
            zipfile.ZipFile(truncated, 'w') as dst:
        programs = sorted(n for n in src.namelist()
                          if n.startswith('programs/'))
        for name in src.namelist():
            if name == programs[0]:
                continue
            dst.writestr(name, src.read(name))
    with pytest.raises(ValueError, match='absent from the archive'):
        ExportedDetector(truncated)


def test_per_call_image_size_rejected(artifact):
    """A per-call image_size can't be served by the exported canvases;
    it must raise up front, not melt into per-image failure records."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    img = np.zeros((240, 320, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match='image_size'):
        detector.preprocess_image(img, 'a.jpg', image_size=640)
    with pytest.raises(ValueError, match='image_size'):
        detector.generate_detections_one_batch(
            [img], ['a.jpg'], detection_threshold=0.005, image_size=640)
    # The export-time size itself is fine
    info = detector.preprocess_image(img, 'a.jpg', image_size=IMAGE_SIZE)
    assert info['img_processed'] is not None


def test_options_beyond_export_rejected(artifact):
    """Capacity/padding requests beyond the exported shapes fail at
    construction with a re-export pointer."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    with pytest.raises(ValueError, match='max_pre_nms_topk'):
        ExportedDetector(artifact[0],
                         detector_options={'max_pre_nms_topk': 8192})
    with pytest.raises(ValueError, match='pad_batches_to'):
        ExportedDetector(artifact[0],
                         detector_options={'pad_batches_to': 64})


def test_effective_topk_maps_to_ladder(artifact):
    """Escalation capacities round up to the exported ladder entry that
    will actually execute (no redundant re-runs on sparse ladders)."""

    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    detector = ExportedDetector(artifact[0])
    detector._topk_ladder = [512, 8192]
    assert detector._effective_topk(512) == 512
    assert detector._effective_topk(600) == 8192
    assert detector._effective_topk(1024) == 8192
    assert detector._effective_topk(8192) == 8192


def test_platform_mismatch_rejected(artifact, tmp_path):
    """A tpu-only artifact loaded on a cpu backend must fail at load
    time, not at the first program call."""

    import json
    from megadetector_tpu.detection.export_detector import (
        ExportedDetector, MANIFEST_NAME)
    tpu_only = str(tmp_path / 'tpuonly.mdpkg')
    with zipfile.ZipFile(artifact[0]) as src, \
            zipfile.ZipFile(tpu_only, 'w') as dst:
        for name in src.namelist():
            blob = src.read(name)
            if name == MANIFEST_NAME:
                manifest = json.loads(blob)
                manifest['platforms'] = ['tpu']
                blob = json.dumps(manifest)
            dst.writestr(name, blob)
    with pytest.raises(ValueError, match='platform'):
        ExportedDetector(tpu_only)


def test_cross_platform_export(tiny_checkpoint, tmp_path):
    """A CPU host can export artifacts that also carry TPU lowerings
    (build the .mdpkg on a CPU box, ship it to the TPU fleet)."""

    import json
    from megadetector_tpu.detection.export_detector import (
        export_detector, ExportedDetector, MANIFEST_NAME)
    out = str(tmp_path / 'xplat.mdpkg')
    manifest = export_detector(
        tiny_checkpoint, out, batch_sizes=[1], aspects=[],
        platforms=['cpu', 'tpu'])
    assert manifest['platforms'] == ['cpu', 'tpu']
    with zipfile.ZipFile(out) as z:
        assert json.loads(z.read(MANIFEST_NAME))['platforms'] == \
            ['cpu', 'tpu']
    # Multi-platform programs still execute on the current (cpu) backend
    detector = ExportedDetector(out)
    result = detector.generate_detections_one_image(
        np.zeros((200, 200, 3), dtype=np.uint8), 'z.jpg',
        detection_threshold=0.005)
    assert result['detections'] is not None


def test_serving_from_artifact(artifact):
    """The serving daemon runs straight from an .mdpkg artifact."""

    import io
    from PIL import Image
    from megadetector_tpu.serving.server import MDServer, ServingOptions
    from megadetector_tpu.serving import client as md_client

    options = ServingOptions()
    options.port = 0
    options.max_batch_size = 2
    options.batch_wait_ms = 5.0
    options.force_cpu = True
    rng = np.random.RandomState(7)
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)) \
        .save(buf, format='JPEG')
    with MDServer(artifact[0], options) as server:
        url = 'http://127.0.0.1:{}'.format(server.port)
        record = md_client.detect_image_bytes(
            url, buf.getvalue(), image_id='cam/a.jpg')
    assert record['file'] == 'cam/a.jpg'
    assert isinstance(record['detections'], list)


def test_export_cli(tiny_checkpoint, tmp_path):
    import subprocess
    import sys
    out = str(tmp_path / 'cli.mdpkg')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # JAX_PLATFORMS alone is overridden by site customization on this
    # box; force_cpu routes through jax.config.update, which is
    # authoritative — the suite must never touch the remote TPU
    result = subprocess.run(
        [sys.executable, '-m',
         'megadetector_tpu.detection.export_detector',
         tiny_checkpoint, out, '--batch_sizes', '1', '--aspects', '1:1',
         '--detector_options', 'force_cpu=true'],
        capture_output=True, text=True, env=env, timeout=600)
    assert result.returncode == 0, result.stderr
    assert os.path.isfile(out)
