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
