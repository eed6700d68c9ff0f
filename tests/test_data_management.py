"""Tests for the data-management layer (CCT utils, converters, EXIF)."""

import datetime
import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def _cct_db():
    return {
        'images': [
            {'id': 'im0', 'file_name': 'loc1/im0.jpg', 'width': 100,
             'height': 80, 'location': 'loc1',
             'datetime': '2024-01-01 10:00:00'},
            {'id': 'im1', 'file_name': 'loc1/im1.jpg', 'width': 100,
             'height': 80, 'location': 'loc1',
             'datetime': '2024-01-01 10:00:30'},
            {'id': 'im2', 'file_name': 'loc1/im2.jpg', 'width': 100,
             'height': 80, 'location': 'loc1',
             'datetime': '2024-01-01 12:00:00'},
            {'id': 'im3', 'file_name': 'loc2/im3.jpg', 'width': 100,
             'height': 80, 'location': 'loc2',
             'datetime': '2024-01-01 10:00:10'},
        ],
        'annotations': [
            {'id': 'a0', 'image_id': 'im0', 'category_id': 1,
             'bbox': [10, 10, 30, 20]},
            {'id': 'a1', 'image_id': 'im0', 'category_id': 2,
             'bbox': [50, 40, 20, 20]},
            {'id': 'a2', 'image_id': 'im1', 'category_id': 1,
             'bbox': [12, 11, 30, 20]},
            {'id': 'a3', 'image_id': 'im2', 'category_id': 0},
        ],
        'categories': [
            {'id': 0, 'name': 'empty'},
            {'id': 1, 'name': 'Deer'},
            {'id': 2, 'name': 'fox'},
        ],
        'info': {'version': '1.0'},
    }


def test_indexed_json_db():
    from megadetector_tpu.data_management.cct_json_utils import \
        IndexedJsonDb
    db = IndexedJsonDb(_cct_db())
    assert db.filename_to_id['loc1/im0.jpg'] == 'im0'
    im0 = db.image_id_to_image['im0']
    assert len(db.get_annotations_for_image(im0)) == 2
    # Classes lower-cased
    assert db.get_classes_for_image(im0) == ['deer', 'fox']
    assert db.cat_name_to_id['deer'] == 1


def test_create_sequences():
    from megadetector_tpu.data_management.cct_json_utils import (
        SequenceOptions, create_sequences)
    db = _cct_db()
    create_sequences(db, SequenceOptions())
    by_id = {im['id']: im for im in db['images']}
    # im0 and im1 are 30s apart at loc1 -> same sequence
    assert by_id['im0']['seq_id'] == by_id['im1']['seq_id']
    assert by_id['im0']['frame_num'] == 0
    assert by_id['im1']['frame_num'] == 1
    assert by_id['im0']['seq_num_frames'] == 2
    # im2 is 2 hours later -> new sequence
    assert by_id['im2']['seq_id'] != by_id['im0']['seq_id']
    # im3 is at a different location -> different sequence namespace
    assert 'loc2' in by_id['im3']['seq_id']


def test_parse_datetime_formats():
    from megadetector_tpu.data_management.cct_json_utils import \
        parse_datetime_string
    assert parse_datetime_string('2024:06:01 08:30:00') == \
        datetime.datetime(2024, 6, 1, 8, 30, 0)
    assert parse_datetime_string('2024-06-01 08:30:00') == \
        datetime.datetime(2024, 6, 1, 8, 30, 0)
    assert parse_datetime_string('garbage') is None
    assert parse_datetime_string(None) is None


def test_coco_to_yolo_and_back(tmp_path):
    from megadetector_tpu.data_management.coco_to_yolo import coco_to_yolo
    from megadetector_tpu.data_management.yolo_to_coco import yolo_to_coco

    db = _cct_db()
    input_file = str(tmp_path / 'cct.json')
    ct_utils.write_json(input_file, db)

    # Create the images so yolo_to_coco can read sizes
    image_folder = str(tmp_path / 'yolo')
    rng = np.random.RandomState(0)
    for im in db['images']:
        p = os.path.join(image_folder, im['file_name'])
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (80, 100, 3),
                                    dtype=np.uint8)).save(p)

    out = coco_to_yolo(None, image_folder, input_file,
                       category_names_to_exclude=['empty'])
    assert out['class_list'] == ['Deer', 'fox']
    rows = out['image_to_yolo_rows']['loc1/im0.jpg']
    assert len(rows) == 2
    # First box: [10,10,30,20] in 100x80 -> cx=0.25, cy=0.25, w=0.3, h=0.25
    cls, cx, cy, w, h = rows[0]
    assert cls == 0
    assert cx == pytest.approx(0.25)
    assert cy == pytest.approx(0.25)
    assert w == pytest.approx(0.30)
    assert h == pytest.approx(0.25)

    # Label files written next to images
    label_fn = os.path.join(image_folder, 'loc1/im0.txt')
    assert os.path.isfile(label_fn)

    # Round trip back to COCO
    coco = yolo_to_coco(image_folder,
                        os.path.join(image_folder, 'classes.txt'))
    by_id = {im['id']: im for im in coco['images']}
    assert 'loc1/im0.jpg' in by_id
    anns = [a for a in coco['annotations']
            if a['image_id'] == 'loc1/im0.jpg']
    assert len(anns) == 2
    bbox = sorted(anns, key=lambda a: a['bbox'][0])[0]['bbox']
    assert bbox == pytest.approx([10, 10, 30, 20], abs=0.1)


def test_yolo_txt_output_to_md_output(tmp_path):
    from megadetector_tpu.data_management.yolo_output_to_md_output import \
        yolo_txt_output_to_md_output

    image_folder = str(tmp_path / 'images')
    os.makedirs(image_folder)
    Image.fromarray(np.zeros((80, 100, 3), dtype=np.uint8)).save(
        os.path.join(image_folder, 'a.jpg'))

    results_folder = str(tmp_path / 'labels')
    os.makedirs(results_folder)
    with open(os.path.join(results_folder, 'a.txt'), 'w') as f:
        f.write('0 0.5 0.5 0.2 0.4 0.9\n')

    out = yolo_txt_output_to_md_output(results_folder, image_folder,
                                       str(tmp_path / 'md.json'))
    det = out['images'][0]['detections'][0]
    assert det['category'] == '1'
    assert det['conf'] == 0.9
    assert det['bbox'] == pytest.approx([0.4, 0.3, 0.2, 0.4])


def test_integrity_check(tmp_path):
    from megadetector_tpu.data_management.integrity_check_json_db import (
        IntegrityCheckOptions, integrity_check_json_db)
    db = _cct_db()
    sorted_cats, data, error_info = integrity_check_json_db(
        db, IntegrityCheckOptions())
    assert sorted_cats[0]['name'] == 'Deer'
    assert sorted_cats[0]['count'] == 2
    assert error_info['validation_errors'] == []

    # Broken reference raises
    db_bad = _cct_db()
    db_bad['annotations'][0]['category_id'] = 99
    with pytest.raises(AssertionError):
        integrity_check_json_db(db_bad, IntegrityCheckOptions())


def test_subset_json_db():
    from megadetector_tpu.data_management.subset_json_db import \
        subset_json_db
    db = _cct_db()
    out = subset_json_db(db, 'loc1')
    assert len(out['images']) == 3
    assert len(out['annotations']) == 4
    out = subset_json_db(db, 'loc2')
    assert len(out['images']) == 1
    assert len(out['annotations']) == 0


def test_read_exif(tmp_path):
    from megadetector_tpu.data_management.read_exif import (
        read_pil_exif, read_exif_from_folder, exif_gps_to_decimal_degrees)

    # Build an image with EXIF
    p = str(tmp_path / 'exif.jpg')
    im = Image.fromarray(np.zeros((10, 10, 3), dtype=np.uint8))
    exif = Image.Exif()
    exif[306] = '2024:06:01 08:30:00'  # DateTime
    im.save(p, exif=exif)

    tags = read_pil_exif(p)
    assert tags.get('DateTime') == '2024:06:01 08:30:00'

    results = read_exif_from_folder(str(tmp_path))
    assert len(results) == 1
    assert results[0]['file_name'] == 'exif.jpg'
    assert results[0]['exif_tags'].get('DateTime') == \
        '2024:06:01 08:30:00'

    # GPS conversion
    gps = exif_gps_to_decimal_degrees({
        'GPSLatitude': (47.0, 30.0, 0.0), 'GPSLatitudeRef': 'N',
        'GPSLongitude': (122.0, 15.0, 0.0), 'GPSLongitudeRef': 'W'})
    assert gps[0] == pytest.approx(47.5)
    assert gps[1] == pytest.approx(-122.25)
