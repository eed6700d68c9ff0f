"""Tests for profiling, change detection, CSV report, visualization
drivers, augment mode, and diagnostics."""

import csv
import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def test_stage_timer():
    import time
    from megadetector_tpu.utils.profiling import StageTimer
    timer = StageTimer()
    with timer.time_stage('load'):
        time.sleep(0.01)
    with timer.time_stage('load'):
        time.sleep(0.01)
    timer.record('forward', 0.5)
    stats = timer.stats()
    assert stats['load']['n'] == 2
    assert stats['load']['mean'] >= 0.009
    assert stats['forward']['total'] == 0.5
    assert 'forward' in timer.summary()


def test_throughput_meter():
    from megadetector_tpu.utils.profiling import ThroughputMeter
    meter = ThroughputMeter()
    meter.update(10)
    assert meter.n_items == 10
    line = meter.summary_line()
    assert 'Finished inference for 10 images' in line


def test_accelerator_test():
    from megadetector_tpu.utils.accelerator_test import accelerator_test
    result = accelerator_test(verbose=False)
    assert result['jax_ok']
    assert result['platform'] == 'cpu'
    assert result['n_devices'] == 8
    assert result['smoke_test_ok']


def test_process_utils():
    from megadetector_tpu.utils.process_utils import execute_and_print
    r = execute_and_print('echo hello', print_output=False)
    assert r['status'] == 0
    assert 'hello' in ''.join(r['output'])
    r = execute_and_print('exit 3', print_output=False)
    assert r['status'] == 3


def test_change_detection(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from megadetector_tpu.detection.change_detection import (
        ChangeDetectionOptions, process_folders)

    folder = str(tmp_path / 'cam1')
    os.makedirs(folder)
    rng = np.random.RandomState(0)
    base = rng.randint(100, 130, (60, 80, 3)).astype(np.uint8)
    # Static scene for 3 frames, then an object appears
    for i in range(3):
        Image.fromarray(base).save(
            os.path.join(folder, 'img_{:02d}.jpg'.format(i)))
    moved = base.copy()
    moved[10:40, 20:60] = 255
    Image.fromarray(moved).save(os.path.join(folder, 'img_03.jpg'))

    options = ChangeDetectionOptions()
    options.motion_fraction_threshold = 0.01
    output_csv = str(tmp_path / 'motion.csv')
    results = process_folders(str(tmp_path), output_csv, options)
    by_file = {os.path.basename(r['file']): r for r in results}
    assert not by_file['img_01.jpg']['motion']
    assert not by_file['img_02.jpg']['motion']
    assert by_file['img_03.jpg']['motion']
    assert os.path.isfile(output_csv)
    with open(output_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ['file', 'motion_fraction', 'motion']


def test_generate_csv_report(tmp_path):
    from megadetector_tpu.postprocessing.generate_csv_report import \
        generate_csv_report

    data = {'images': [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['0', 0.8]]},
            {'category': '2', 'conf': 0.5, 'bbox': [0.5, 0.5, 0.1, 0.1]},
        ]},
        {'file': 'b.jpg', 'detections': None, 'failure': 'oops'},
    ], 'detection_categories': {'1': 'animal', '2': 'person',
                                '3': 'vehicle'},
        'classification_categories': {'0': 'deer'},
        'info': {'detector_metadata': {
            'typical_detection_threshold': 0.2}}}
    results_file = str(tmp_path / 'r.json')
    ct_utils.write_json(results_file, data)

    out = generate_csv_report(results_file, str(tmp_path / 'report.csv'))
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    a = rows[0]
    assert a['status'] == 'success'
    assert a['n_animal'] == '1'
    assert a['n_person'] == '1'
    assert a['top_classification'] == 'deer'
    assert rows[1]['status'] == 'failure'


def test_visualize_detector_output(tmp_path):
    from megadetector_tpu.visualization.visualize_detector_output import \
        visualize_detector_output

    images_dir = str(tmp_path / 'images')
    os.makedirs(images_dir)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                dtype=np.uint8)).save(
        os.path.join(images_dir, 'a.jpg'))

    data = {'images': [{'file': 'a.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.3, 0.3]}]}],
        'detection_categories': {'1': 'animal'}, 'info': {}}
    results_file = str(tmp_path / 'r.json')
    ct_utils.write_json(results_file, data)

    rendered = visualize_detector_output(
        results_file, str(tmp_path / 'out'), images_dir,
        parallelize_rendering=False)
    assert len(rendered) == 1
    assert os.path.isfile(rendered[0])


def test_visualize_db(tmp_path):
    from megadetector_tpu.visualization.visualize_db import (
        DbVizOptions, visualize_db)

    images_dir = str(tmp_path / 'images')
    os.makedirs(images_dir)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                dtype=np.uint8)).save(
        os.path.join(images_dir, 'a.jpg'))

    db = {'images': [{'id': 'a', 'file_name': 'a.jpg', 'width': 80,
                      'height': 60}],
          'annotations': [{'id': '0', 'image_id': 'a', 'category_id': 1,
                           'bbox': [10, 10, 30, 30]}],
          'categories': [{'id': 1, 'name': 'deer'}]}
    db_file = str(tmp_path / 'db.json')
    ct_utils.write_json(db_file, db)

    html, images = visualize_db(db_file, str(tmp_path / 'out'),
                                images_dir, DbVizOptions())
    assert os.path.isfile(html)
    assert 'deer' in open(html).read()


def test_augmented_inference(tmp_path):
    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(tmp_path / 'm.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 128, 'anchors': cfg.anchors.tolist()})

    detector = TPUDetector(path)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 120, 3), dtype=np.uint8)
    plain = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2)
    augmented = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2, augment=True)
    assert augmented['detections'] is not None
    # Augmented inference sees 3 views; both produce valid MD output
    for det in augmented['detections']:
        x, y, w, h = det['bbox']
        assert -0.001 <= x and x + w <= 1.001
        assert -0.001 <= y and y + h <= 1.001
