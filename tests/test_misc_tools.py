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


def test_motion_history_and_previews(tmp_path):
    """Motion-history mode accumulates decaying motion; previews render
    (reference: change_detection.py:107-180,610-704)."""

    import cv2
    from megadetector_tpu.detection.change_detection import (
        ChangeDetectionMethod, ChangeDetectionOptions,
        create_change_previews, detect_motion)

    folder = tmp_path / 'cam'
    folder.mkdir()
    rng = np.random.RandomState(0)
    base = rng.randint(80, 120, (60, 80), dtype=np.uint8)
    paths = []
    for i in range(6):
        img = base.copy()
        if i >= 3:
            img[20:40, 30 + 5 * i:50 + 5 * i] = 250  # moving block
        p = str(folder / 'im{}.jpg'.format(i))
        cv2.imwrite(p, img)
        paths.append(p)

    options = ChangeDetectionOptions()
    options.method = ChangeDetectionMethod.MOTION_HISTORY
    options.blur_kernel = 1
    results = detect_motion(paths, options)
    assert results[0]['motion_fraction'] == 0.0
    assert any(r['motion'] for r in results[3:])
    # MHI decays: motion persists (nonzero) after the event
    assert results[-1]['motion_fraction'] > 0

    previews = create_change_previews(results, str(tmp_path / 'prev'),
                                      num_samples=3)
    assert len(previews) >= 1
    assert all(os.path.isfile(p) for p in previews)


def test_adaptive_threshold_mode(tmp_path):
    import cv2
    from megadetector_tpu.detection.change_detection import (
        ChangeDetectionOptions, ThresholdMethod, detect_motion)

    folder = tmp_path / 'cam2'
    folder.mkdir()
    rng = np.random.RandomState(1)
    base = rng.randint(80, 120, (60, 80), dtype=np.uint8)
    paths = []
    for i in range(3):
        img = base.copy()
        if i == 2:
            img[10:50, 10:70] = 240
        p = str(folder / 'im{}.jpg'.format(i))
        cv2.imwrite(p, img)
        paths.append(p)

    options = ChangeDetectionOptions()
    options.threshold_method = ThresholdMethod.ADAPTIVE
    options.blur_kernel = 1
    results = detect_motion(paths, options)
    assert all(np.isfinite(r['motion_fraction']) for r in results)
    assert results[2]['motion_fraction'] > results[1]['motion_fraction']


def test_yolo_val_runner_with_fake_valpy(tmp_path):
    """Symlink farm, chunked resumable checkpointing, and YOLO-json ->
    MD conversion, driven through a fake val.py (no torch repo needed;
    reference machinery: run_inference_with_yolov5_val.py:140-152 +
    the chunked-checkpoint loop)."""

    import json
    from PIL import Image as PILImage
    from megadetector_tpu.detection.run_inference_with_yolo_val import (
        YoloInferenceOptions, run_inference_with_yolo_val)

    # Images (duplicate basenames across folders to force the farm)
    input_folder = tmp_path / 'imgs'
    for cam in ('camA', 'camB'):
        (input_folder / cam).mkdir(parents=True)
        for i in range(2):
            PILImage.fromarray(
                np.full((40, 60, 3), 100, np.uint8)).save(
                str(input_folder / cam / 'pic{}.jpg'.format(i)))

    # Fake YOLO repo: val.py lists the dataset folder's images and
    # emits one centered detection per image
    repo = tmp_path / 'yolo_repo'
    repo.mkdir()
    (repo / 'val.py').write_text('''
import argparse, json, os, sys
p = argparse.ArgumentParser()
for a in ('--task','--data','--weights','--device','--name'):
    p.add_argument(a)
for a in ('--batch-size','--imgsz'):
    p.add_argument(a, type=int)
p.add_argument('--conf-thres', type=float)
p.add_argument('--save-json', action='store_true')
p.add_argument('--project')
p.add_argument('--exist-ok', action='store_true')
p.add_argument('--augment', action='store_true')
args = p.parse_args()
folder = None
for line in open(args.data):
    if line.startswith('path:'):
        folder = line.split(':', 1)[1].strip()
preds = []
for fn in sorted(os.listdir(folder)):
    base, ext = os.path.splitext(fn)
    if ext.lower() not in ('.jpg', '.jpeg', '.png'):
        continue
    preds.append({'image_id': base, 'category_id': 0,
                  'bbox': [15.0, 10.0, 30.0, 20.0], 'score': 0.9})
out_dir = os.path.join(args.project, 'results')
os.makedirs(out_dir, exist_ok=True)
with open(os.path.join(out_dir, 'best_predictions.json'), 'w') as f:
    json.dump(preds, f)
''')

    options = YoloInferenceOptions()
    options.input_folder = str(input_folder)
    options.model_filename = 'fake.pt'
    options.output_file = str(tmp_path / 'yolo_md.json')
    options.yolo_working_folder = str(repo)
    options.checkpoint_frequency = 3  # 4 images -> 2 chunks
    options.checkpoint_folder = str(tmp_path / 'ckpts')

    md = run_inference_with_yolo_val(options)
    assert len(md['images']) == 4
    files = {im['file'] for im in md['images']}
    assert 'camA/pic0.jpg' in files and 'camB/pic0.jpg' in files
    for im in md['images']:
        assert len(im['detections']) == 1
        det = im['detections'][0]
        assert det['category'] == '1'
        # bbox [15,10,30,20] px on a 60x40 image -> [0.25,0.25,0.5,0.5]
        assert abs(det['bbox'][0] - 0.25) < 1e-3
        assert abs(det['bbox'][2] - 0.5) < 1e-3

    # Resume: delete the output, rerun — completed chunks are skipped
    shard0 = os.path.join(options.checkpoint_folder,
                          'chunk_0000_predictions.json')
    assert os.path.isfile(shard0)
    md2 = run_inference_with_yolo_val(options)
    assert len(md2['images']) == 4

    # unique_id_strategy=verify errors on duplicate basenames
    options2 = YoloInferenceOptions()
    options2.input_folder = str(input_folder)
    options2.model_filename = 'fake.pt'
    options2.output_file = str(tmp_path / 'yolo_md2.json')
    options2.yolo_working_folder = str(repo)
    options2.unique_id_strategy = 'verify'
    with pytest.raises(AssertionError):
        run_inference_with_yolo_val(options2)


def test_augmented_fused_matches_unfused(tmp_path):
    """The TTA program's candidate-level flip/scale transform (fused
    default) must agree with the unfused full-tensor TTA path at the
    golden tolerances."""

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.models.detector import TPUDetector
    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=11)
    path = str(tmp_path / 'm.npz')
    save_checkpoint(params, path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 128, 'anchors': cfg.anchors.tolist()})

    # Large pre_nms_topk so neither path truncates: random weights put
    # >512 TTA candidates above the filter, and under truncation the
    # per-pass (fused) and global (unfused) top-k keep legitimately
    # different tails
    fused = TPUDetector(path, detector_options={'pre_nms_topk': 4096})
    unfused = TPUDetector(path, detector_options={
        'fused_decode': False, 'pre_nms_topk': 4097})
    assert fused._fused_decode and not unfused._fused_decode

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (100, 120, 3), dtype=np.uint8)
    out_f = fused.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2, augment=True)
    out_u = unfused.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2, augment=True)

    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.25
    options.iou_match_threshold = 0.85
    options.max_conf_error = 0.005
    options.max_coord_error = 0.005
    result = compare_detection_lists(out_u['detections'],
                                     out_f['detections'],
                                     options=options, image_id='x.jpg')
    assert result['errors'] == [], result['errors']
