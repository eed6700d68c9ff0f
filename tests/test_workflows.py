"""Tests for workflow drivers, labelme converters, calibration, and the
confusion matrix."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import ct_utils


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(folder / 'md_test.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    return path


def test_batch_job_workflow(tiny_checkpoint, tmp_path):
    from megadetector_tpu.workflows.manage_local_batch import (
        BatchJob, BatchJobOptions)

    input_path = str(tmp_path / 'images' / 'cam1')
    os.makedirs(input_path)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (50, 60, 3),
                                    dtype=np.uint8)).save(
            os.path.join(input_path, 'im{}.jpg'.format(i)))

    options = BatchJobOptions()
    options.input_path = str(tmp_path / 'images')
    options.output_base = str(tmp_path / 'jobs')
    options.job_name = 'test_job'
    options.model_file = tiny_checkpoint
    options.batch_size = 4
    options.run_rde = True
    options.rde_occurrence_threshold = 1000  # nothing will be flagged
    options.preview_sample_size = 5
    options.checkpoint_frequency = -1

    job = BatchJob(options)
    final_file = job.run_all()

    assert os.path.isfile(final_file)
    assert os.path.isfile(os.path.join(job.preview_dir, 'index.html'))
    assert os.path.isfile(job.report_file)
    with open(final_file) as f:
        data = json.load(f)
    assert len(data['images']) == 4


def test_video_batch_workflow(tiny_checkpoint, tmp_path):
    cv2 = pytest.importorskip('cv2')
    from megadetector_tpu.workflows.manage_video_batch import (
        VideoBatchOptions, process_video_folder_via_frames)

    video_folder = str(tmp_path / 'videos')
    os.makedirs(video_folder)
    rng = np.random.RandomState(0)
    path = os.path.join(video_folder, 'v.mp4')
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 5.0,
                          (64, 48))
    for _ in range(10):
        out.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    out.release()

    options = VideoBatchOptions()
    options.model_file = tiny_checkpoint
    options.input_video_folder = video_folder
    options.frame_folder = str(tmp_path / 'frames')
    options.output_json_file = str(tmp_path / 'videos.json')
    options.every_n_frames = 5

    data = process_video_folder_via_frames(options)
    by_file = {im['file']: im for im in data['images']}
    assert 'v.mp4' in by_file
    assert by_file['v.mp4']['frames_processed'] == [0, 5]
    assert by_file['v.mp4']['frame_rate'] == pytest.approx(5.0, abs=0.1)


def test_labelme_round_trip(tmp_path):
    from megadetector_tpu.data_management.labelme_to_coco import \
        labelme_to_coco
    from megadetector_tpu.data_management.coco_to_labelme import \
        coco_to_labelme

    folder = str(tmp_path / 'images')
    os.makedirs(folder)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                dtype=np.uint8)).save(
        os.path.join(folder, 'a.jpg'))
    Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                dtype=np.uint8)).save(
        os.path.join(folder, 'b.jpg'))

    labelme = {'version': '5.3.0', 'flags': {},
               'shapes': [{'label': 'deer',
                           'points': [[10, 10], [40, 40]],
                           'group_id': None,
                           'shape_type': 'rectangle', 'flags': {}}],
               'imagePath': 'a.jpg', 'imageData': None,
               'imageHeight': 60, 'imageWidth': 80}
    ct_utils.write_json(os.path.join(folder, 'a.json'), labelme)

    coco = labelme_to_coco(folder)
    assert len(coco['images']) == 2
    anns = [a for a in coco['annotations'] if 'bbox' in a]
    assert len(anns) == 1
    assert anns[0]['bbox'] == [10, 10, 30, 30]
    names = {c['name'] for c in coco['categories']}
    assert 'deer' in names and 'empty' in names

    # b.jpg has no labels -> writing labelme files creates b.json
    os.remove(os.path.join(folder, 'a.json'))
    files = coco_to_labelme(coco, folder)
    assert len(files) == 2
    with open(os.path.join(folder, 'a.json')) as f:
        round_tripped = json.load(f)
    assert round_tripped['shapes'][0]['label'] == 'deer'
    assert round_tripped['shapes'][0]['points'] == [[10, 10], [40, 40]]


def test_detector_calibration(tmp_path):
    from megadetector_tpu.postprocessing.detector_calibration import (
        calibrate_threshold, compare_model_confidence_values)

    # Model B's confidences = model A's * 0.5
    rng = np.random.RandomState(0)
    images_a = []
    images_b = []
    for i in range(50):
        conf = float(rng.uniform(0.1, 1.0))
        bbox = [0.1, 0.1, 0.2, 0.2]
        images_a.append({'file': 'im{}.jpg'.format(i), 'detections': [
            {'category': '1', 'conf': round(conf, 3), 'bbox': bbox}]})
        images_b.append({'file': 'im{}.jpg'.format(i), 'detections': [
            {'category': '1', 'conf': round(conf * 0.5, 3),
             'bbox': bbox}]})

    def write(images, name):
        p = str(tmp_path / name)
        ct_utils.write_json(p, {
            'images': images, 'detection_categories': {'1': 'animal'},
            'info': {}})
        return p

    fa = write(images_a, 'a.json')
    fb = write(images_b, 'b.json')

    from megadetector_tpu.postprocessing.detector_calibration import (
        CalibrationMatchColumns, CalibrationOptions, CalibrationResults)

    results = compare_model_confidence_values(fa, fb)
    assert isinstance(results, CalibrationResults)
    pairs = results.category_to_matched_confidence_values()
    assert '1' in pairs
    a, b = pairs['1']
    np.testing.assert_allclose(b, a * 0.5, atol=0.01)

    # Match-tuple layout per the reference's CalibrationMatchColumns
    m = results.calibration_matches[0]
    assert m[CalibrationMatchColumns.COLUMN_IOU] >= 0.6
    assert m[CalibrationMatchColumns.COLUMN_CATEGORY_ID] == '1'
    assert m[CalibrationMatchColumns.COLUMN_MATCHES_GT] is None

    # With COCO ground truth, matches_gt becomes a bool: im0's GT box
    # overlaps the detections, im1's GT box does not
    gt = {'images': [
              {'id': 0, 'file_name': 'im0.jpg', 'width': 100,
               'height': 100},
              {'id': 1, 'file_name': 'im1.jpg', 'width': 100,
               'height': 100}],
          'categories': [{'id': 5, 'name': 'animal'}],
          'annotations': [
              {'id': 0, 'image_id': 0, 'category_id': 5,
               'bbox': [10, 10, 20, 20]},
              {'id': 1, 'image_id': 1, 'category_id': 5,
               'bbox': [70, 70, 20, 20]}]}
    results_gt = compare_model_confidence_values(fa, fb, gt)
    by_image = {m[CalibrationMatchColumns.COLUMN_I_IMAGE]:
                m[CalibrationMatchColumns.COLUMN_MATCHES_GT]
                for m in results_gt.calibration_matches}
    assert by_image[0] is True
    assert by_image[1] is False

    # return_data populates the loaded dicts
    opts = CalibrationOptions()
    opts.return_data = True
    results_d = compare_model_confidence_values(fa, fb, options=opts)
    assert results_d.data_a['detection_categories'] == {'1': 'animal'}

    t = calibrate_threshold(fa, fb, 0.6)
    assert t == pytest.approx(0.3, abs=0.05)


def test_confusion_matrix(tmp_path):
    from megadetector_tpu.postprocessing.render_detection_confusion_matrix \
        import render_detection_confusion_matrix

    md = {'images': [
        {'file': 'a.jpg', 'detections': [
            # Correct animal
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            # FP (no ground truth there)
            {'category': '2', 'conf': 0.8, 'bbox': [0.6, 0.6, 0.1, 0.1]},
        ]},
        {'file': 'b.jpg', 'detections': []},  # FN: misses the animal
    ], 'detection_categories': {'1': 'animal', '2': 'person'},
        'info': {}}
    results_file = str(tmp_path / 'md.json')
    ct_utils.write_json(results_file, md)

    gt = {'images': [
        {'id': 'a', 'file_name': 'a.jpg', 'width': 100, 'height': 100},
        {'id': 'b', 'file_name': 'b.jpg', 'width': 100, 'height': 100},
    ], 'annotations': [
        {'id': 0, 'image_id': 'a', 'category_id': 1,
         'bbox': [10, 10, 20, 20]},
        {'id': 1, 'image_id': 'b', 'category_id': 1,
         'bbox': [30, 30, 20, 20]},
    ], 'categories': [{'id': 1, 'name': 'animal'}]}
    gt_file = str(tmp_path / 'gt.json')
    ct_utils.write_json(gt_file, gt)

    out_html = str(tmp_path / 'cm.html')
    results = render_detection_confusion_matrix(
        results_file, gt_file, out_html, confidence_threshold=0.5)
    stats = results['per_category']
    assert stats['animal']['tp'] == 1
    assert stats['animal']['fn'] == 1
    assert stats['person']['fp'] == 1
    assert os.path.isfile(out_html)


def test_batch_job_operator_affordances(tiny_checkpoint, tmp_path):
    """Chunk planning, audit, unused-category removal, zip,
    interesting-category preview, and top-folder splitting
    (reference notebook cells manage_local_batch.py:494-785,863-980,
    1932-2070)."""

    from megadetector_tpu.workflows.manage_local_batch import (
        BatchJob, BatchJobOptions)

    input_path = str(tmp_path / 'images')
    rng = np.random.RandomState(1)
    for cam in ('camA', 'camB'):
        os.makedirs(os.path.join(input_path, cam))
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (50, 60, 3),
                                        dtype=np.uint8)).save(
                os.path.join(input_path, cam, 'im{}.jpg'.format(i)))

    options = BatchJobOptions()
    options.input_path = input_path
    options.output_base = str(tmp_path / 'jobs')
    options.job_name = 'op_job'
    options.model_file = tiny_checkpoint
    options.batch_size = 4
    options.run_rde = False
    options.checkpoint_frequency = -1

    job = BatchJob(options)
    job.enumerate_images()

    script = job.plan_chunks(2)
    assert os.path.isfile(script)
    content = open(script).read()
    assert 'run_detector_batch' in content
    assert 'combine_batch_outputs' in content
    assert os.path.isfile(os.path.join(
        job.job_dir, 'chunks', 'chunk_000_files.json'))

    job.run_detector()
    job.validate()

    audit = job.audit_results()
    assert audit['n_images'] == 6
    assert audit['missing'] == []

    # Attach a fake classification so category cleanup has work to do
    with open(job.final_file) as f:
        data = json.load(f)
    data['classification_categories'] = {'0': 'deer', '1': 'unused'}
    for det in data['images'][0].get('detections') or []:
        det['classifications'] = [['0', 0.9]]
        break
    ct_utils.write_json(job.final_file, data, force_str=True)
    cleaned = job.remove_unused_categories()
    assert 'unused' not in cleaned['classification_categories'].values()

    zip_path = job.zip_results()
    assert os.path.isfile(zip_path)

    job.build_interesting_preview(['animal'], threshold=0.2)
    assert os.path.isfile(os.path.join(
        job.job_dir, 'preview_interesting', 'index.html'))

    splits = job.split_results_by_top_folder()
    assert splits is not None
    split_dir = os.path.join(job.job_dir, 'splits')
    assert os.path.isdir(split_dir)
    split_files = []
    for root, _, files in os.walk(split_dir):
        split_files.extend(f for f in files if f.endswith('.json'))
    assert len(split_files) >= 2


def test_batch_job_checkpoint_resume(tiny_checkpoint, tmp_path,
                                     capsys):
    """A pre-existing job checkpoint is loaded and its images skipped."""

    from megadetector_tpu.workflows.manage_local_batch import (
        BatchJob, BatchJobOptions)

    input_path = str(tmp_path / 'images' / 'cam1')
    os.makedirs(input_path)
    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (50, 60, 3),
                                    dtype=np.uint8)).save(
            os.path.join(input_path, 'im{}.jpg'.format(i)))

    options = BatchJobOptions()
    options.input_path = str(tmp_path / 'images')
    options.output_base = str(tmp_path / 'jobs')
    options.job_name = 'resume_job'
    options.model_file = tiny_checkpoint
    options.batch_size = 2
    options.run_rde = False
    options.checkpoint_frequency = -1

    job = BatchJob(options)
    job.enumerate_images()
    # Simulate a crashed run that checkpointed one image (checkpoints
    # store the enumerated absolute-path form)
    done_file = job.image_files[0]
    ct_utils.write_json(
        os.path.join(job.job_dir, 'md_checkpoint.json'),
        {'checkpoint': [{'file': done_file,
                         'detections': [], 'sentinel': True}]},
        force_str=True)

    job.run_detector()
    out = capsys.readouterr().out
    assert 'Resuming job resume_job from checkpoint with 1' in out
    with open(job.detections_file) as f:
        data = json.load(f)
    assert len(data['images']) == 3
    # The checkpointed result was reused, not recomputed
    by_file = {im['file']: im for im in data['images']}
    rel = os.path.relpath(done_file,
                          options.input_path).replace('\\', '/')
    assert by_file[rel].get('sentinel') is True
