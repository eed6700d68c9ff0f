"""Tests for third-party importers."""

import csv
import os

import pytest

from megadetector_tpu.data_management.importers import (
    animl_to_md, camtrap_dp_to_md, zamba_to_md)


def test_zamba_to_md(tmp_path):
    p = str(tmp_path / 'zamba.csv')
    with open(p, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['filepath', 'blank', 'elephant', 'lion'])
        w.writerow(['v1.mp4', '0.1', '0.85', '0.05'])
        w.writerow(['v2.mp4', '0.9', '0.05', '0.05'])
    out = zamba_to_md(p)
    by_file = {im['file']: im for im in out['images']}
    v1 = by_file['v1.mp4']
    assert len(v1['detections']) == 1
    top = v1['detections'][0]['classifications'][0]
    assert out['classification_categories'][top[0]] == 'elephant'
    assert top[1] == pytest.approx(0.85)
    assert by_file['v2.mp4']['detections'] == []  # blank


def test_animl_to_md(tmp_path):
    p = str(tmp_path / 'animl.csv')
    with open(p, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['FilePath', 'category', 'conf',
                    'bbox1', 'bbox2', 'bbox3', 'bbox4'])
        w.writerow(['a.jpg', '1', '0.9', '0.1', '0.2', '0.3', '0.4'])
        w.writerow(['b.jpg', '', '', '', '', '', ''])
    out = animl_to_md(p)
    by_file = {im['file']: im for im in out['images']}
    det = by_file['a.jpg']['detections'][0]
    assert det['category'] == '1'
    assert det['bbox'] == [0.1, 0.2, 0.3, 0.4]
    assert by_file['b.jpg']['detections'] == []


def test_camtrap_dp_to_md(tmp_path):
    pkg = str(tmp_path / 'pkg')
    os.makedirs(pkg)
    with open(os.path.join(pkg, 'media.csv'), 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['mediaID', 'filePath'])
        w.writerow(['m1', 'cam/im1.jpg'])
        w.writerow(['m2', 'cam/im2.jpg'])
    with open(os.path.join(pkg, 'observations.csv'), 'w',
              newline='') as f:
        w = csv.writer(f)
        w.writerow(['mediaID', 'observationType', 'scientificName',
                    'classificationProbability',
                    'bboxX', 'bboxY', 'bboxWidth', 'bboxHeight'])
        w.writerow(['m1', 'animal', 'Vulpes vulpes', '0.9',
                    '0.1', '0.1', '0.3', '0.3'])
        w.writerow(['m2', 'blank', '', '', '', '', '', ''])
    out = camtrap_dp_to_md(pkg)
    by_file = {im['file']: im for im in out['images']}
    det = by_file['cam/im1.jpg']['detections'][0]
    assert det['category'] == '1'
    assert det['bbox'] == [0.1, 0.1, 0.3, 0.3]
    class_id = det['classifications'][0][0]
    assert out['classification_categories'][class_id] == 'Vulpes vulpes'
    assert by_file['cam/im2.jpg']['detections'] == []


def test_mewc_to_md(tmp_path):
    from megadetector_tpu.data_management.importers import mewc_to_md
    p = str(tmp_path / 'mewc.csv')
    with open(p, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['filename', 'class_id', 'prob'])
        w.writerow(['a.jpg', 'wombat', '0.88'])
        w.writerow(['b.jpg', 'blank', '0.95'])
    out = mewc_to_md(p)
    by_file = {im['file']: im for im in out['images']}
    det = by_file['a.jpg']['detections'][0]
    cid = det['classifications'][0][0]
    assert out['classification_categories'][cid] == 'wombat'
    assert det['conf'] == 0.88
    assert by_file['b.jpg']['detections'] == []


def test_cct_to_md(tmp_path):
    from megadetector_tpu.data_management.cct_to_md import cct_to_md
    cct = {'images': [{'id': 'im0', 'file_name': 'a.jpg',
                       'width': 100, 'height': 50}],
           'annotations': [{'id': 0, 'image_id': 'im0',
                            'category_id': 3, 'bbox': [10, 5, 20, 10]}],
           'categories': [{'id': 3, 'name': 'deer'}]}
    md = cct_to_md(cct)
    det = md['images'][0]['detections'][0]
    assert det['category'] == '3'
    assert det['conf'] == 1.0
    assert det['bbox'] == [0.1, 0.1, 0.2, 0.2]
    assert md['detection_categories'] == {'3': 'deer'}


def test_labelme_to_yolo(tmp_path):
    import json
    import numpy as np
    from PIL import Image
    from megadetector_tpu.data_management.labelme_to_yolo import \
        labelme_to_yolo

    folder = str(tmp_path)
    Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(
        os.path.join(folder, 'a.jpg'))
    labelme = {'shapes': [{'label': 'deer',
                           'points': [[10, 5], [30, 15]],
                           'shape_type': 'rectangle'}],
               'imageWidth': 100, 'imageHeight': 50}
    with open(os.path.join(folder, 'a.json'), 'w') as f:
        json.dump(labelme, f)
    classes = labelme_to_yolo(folder)
    assert classes == ['deer']
    rows = open(os.path.join(folder, 'a.txt')).read().split()
    assert rows[0] == '0'
    assert abs(float(rows[1]) - 0.2) < 1e-5   # cx = 20/100
    assert abs(float(rows[3]) - 0.2) < 1e-5   # w = 20/100


def test_add_width_and_height(tmp_path):
    import numpy as np
    from PIL import Image
    from megadetector_tpu.data_management.add_width_and_height_to_db \
        import add_width_and_height_to_db

    Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(
        str(tmp_path / 'a.jpg'))
    db = {'images': [{'id': 'a', 'file_name': 'a.jpg'},
                     {'id': 'b', 'file_name': 'missing.jpg'}],
          'annotations': [], 'categories': []}
    out = add_width_and_height_to_db(db, str(tmp_path))
    assert out['images'][0]['width'] == 100
    assert out['images'][0]['height'] == 50
    assert 'error' in out['images'][1]
