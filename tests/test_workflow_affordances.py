"""
Round-3 operator-workflow additions (reference
notebooks/manage_local_batch.py cell chain) and the classic-strict
parity mode.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import ct_utils


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('wf_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(folder / 'wf_test.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=5), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    return path


def _make_job(tmp_path, checkpoint, n_images=4):
    from megadetector_tpu.workflows.manage_local_batch import (
        BatchJob, BatchJobOptions)
    from PIL import Image as PILImage

    input_dir = tmp_path / 'images'
    rng = np.random.RandomState(7)
    for i in range(n_images):
        p = input_dir / 'cam{}'.format(i % 2) / 'im_{}.jpg'.format(i)
        p.parent.mkdir(parents=True, exist_ok=True)
        arr = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        img = PILImage.fromarray(arr)
        exif = PILImage.Exif()
        exif[306] = '2024:06:01 12:0{}:00'.format(i)  # DateTime
        img.save(str(p), exif=exif.tobytes())

    options = BatchJobOptions()
    options.model_file = checkpoint
    options.input_path = str(input_dir)
    options.output_base = str(tmp_path / 'jobs')
    options.job_name = 'testjob'
    options.batch_size = 2
    options.run_rde = False
    options.detector_options = {'use_mesh': 'false'}
    return BatchJob(options)


def test_stage_previews_and_sequences(tmp_path, checkpoint):
    job = _make_job(tmp_path, checkpoint)
    job.enumerate_images()
    job.run_detector()
    job.validate()

    # Stage-labeled preview lands in its own folder
    job.build_preview(stage='pre_rde')
    assert os.path.isfile(os.path.join(
        job.preview_dir + '_pre_rde', 'index.html'))
    job.build_preview()
    assert os.path.isfile(os.path.join(job.preview_dir, 'index.html'))

    # Sequence assembly from EXIF datetimes, location = folder
    info = job.build_sequences(max_gap_seconds=120.0)
    assert len(info) == 4
    assert all(im.get('seq_id') for im in info)
    locations = {im['location'] for im in info}
    assert len(locations) == 2
    # Images 0 and 2 share cam0 and are 2 minutes apart -> same
    # sequence at a 120s gap
    cam0 = sorted((im['file_name'], im['seq_id']) for im in info
                  if im['location'].endswith('cam0'))
    assert cam0[0][1] == cam0[1][1]

    # Classification audit on unclassified results reports zero
    audit = job.audit_classification_results(threshold=0.01)
    assert audit['n_classified'] == 0
    assert audit['n_animal_detections'] >= 0


def test_classic_strict_mode(checkpoint):
    """classic-strict disables the reduction-order-changing rewrites
    but keeps detections within golden tolerance of the default."""

    from megadetector_tpu.models.detector import TPUDetector
    from megadetector_tpu.utils import md_tests as comparator

    strict = TPUDetector(checkpoint, detector_options={
        'compatibility_mode': 'classic-strict'})
    default = TPUDetector(checkpoint)
    assert strict._fused_decode is False
    assert default._fused_decode is True
    assert 'classic' in strict.compatibility_mode

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    r_s = strict.generate_detections_one_image(img, 'x.jpg',
                                               detection_threshold=0.2)
    r_d = default.generate_detections_one_image(img, 'x.jpg',
                                                detection_threshold=0.2)
    options = comparator.MDTestOptions()
    options.comparison_confidence_threshold = 0.25
    options.iou_match_threshold = 0.7
    options.max_conf_error = 0.01
    options.max_coord_error = 0.01
    r = comparator.compare_detection_lists(
        r_s['detections'], r_d['detections'], options, image_id='x.jpg')
    assert not r['errors'], r['errors'][:3]


def test_sequence_methods_and_failure_audit(tmp_path, checkpoint):
    """build_sequences supports 'folder' and 'json' methods (reference
    cells :1702-1849); audit_results raises past
    max_tolerable_failed_images (reference knob at :115)."""

    job = _make_job(tmp_path, checkpoint)
    job.enumerate_images()
    job.run_detector()

    # folder method: each leaf folder is one sequence
    info = job.build_sequences(method='folder')
    assert len(info) == 4
    assert {im['seq_id'] for im in info} == {'cam0', 'cam1'}

    # json method: validated CCT pass-through
    cct = {'images': [
        {'file_name': im['file_name'], 'seq_id': im['seq_id'],
         'seq_num_frames': 2, 'frame_num': 0} for im in info]}
    cct_path = str(tmp_path / 'sequences.json')
    ct_utils.write_json(cct_path, cct)
    job.options.cct_formatted_json = cct_path
    info_json = job.build_sequences(method='json')
    assert len(info_json) == 4

    # json method requires the sequence fields
    bad = {'images': [{'file_name': 'x.jpg', 'seq_id': 's'}]}
    bad_path = str(tmp_path / 'bad_sequences.json')
    ct_utils.write_json(bad_path, bad)
    job.options.cct_formatted_json = bad_path
    with pytest.raises(AssertionError):
        job.build_sequences(method='json')

    # Failure audit: inject failures beyond the tolerance
    with open(job.final_file) as f:
        data = json.load(f)
    for im in data['images']:
        im['failure'] = 'image access failure'
        im['detections'] = None
    ct_utils.write_json(job.final_file, data, force_str=True)
    job.options.max_tolerable_failed_images = 2
    with pytest.raises(RuntimeError):
        job.audit_results()
    job.options.max_tolerable_failed_images = 100
    audit = job.audit_results()
    assert len(audit['failures']) == 4
