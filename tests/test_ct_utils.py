"""Unit tests for the core numeric/container helpers."""

import json
import math
import os

import pytest

from megadetector_tpu.utils import ct_utils


def test_truncate_float():
    assert ct_utils.truncate_float(0.0003214884, 6) == 0.000321
    assert ct_utils.truncate_float(1.0003214884, 6) == 1.000321
    assert ct_utils.truncate_float(0.123456, 3) == 0.123
    assert ct_utils.truncate_float(0.9999, 3) == 0.999
    assert ct_utils.truncate_float(0.0005, 3) == 0.0
    # Whole numbers survive
    assert ct_utils.truncate_float(5.0, 3) == 5.0


def test_round_float():
    assert ct_utils.round_float(0.1234567, 3) == 0.123
    assert ct_utils.round_float(0.9995, 3) == 1.0  # banker's-adjacent
    assert ct_utils.round_float_array([0.11111, 0.25555], 2) == [0.11, 0.26]


def test_truncate_float_array():
    out = ct_utils.truncate_float_array([0.12349, 0.999999], 4)
    assert out == [0.1234, 0.9999]


def test_box_conversions():
    yolo = [0.5, 0.5, 0.2, 0.4]
    xywh = ct_utils.convert_yolo_to_xywh(yolo)
    assert xywh == pytest.approx([0.4, 0.3, 0.2, 0.4])
    xyxy = ct_utils.convert_xywh_to_xyxy(xywh)
    assert xyxy == pytest.approx([0.4, 0.3, 0.6, 0.7])
    tf_box = ct_utils.convert_xywh_to_tf(xywh)
    assert tf_box == pytest.approx([0.3, 0.4, 0.7, 0.6])


def test_get_iou():
    # Identical boxes
    assert ct_utils.get_iou([0.1, 0.1, 0.2, 0.2],
                            [0.1, 0.1, 0.2, 0.2]) == pytest.approx(1.0)
    # Disjoint boxes
    assert ct_utils.get_iou([0.0, 0.0, 0.1, 0.1],
                            [0.5, 0.5, 0.1, 0.1]) == 0.0
    # Half overlap along one axis
    iou = ct_utils.get_iou([0.0, 0.0, 0.2, 0.2], [0.1, 0.0, 0.2, 0.2])
    assert iou == pytest.approx(1.0 / 3.0)


def test_point_and_rect_distance():
    assert ct_utils.point_dist((0, 0), (3, 4)) == 5.0
    # Overlapping rects
    assert ct_utils.rect_distance((0, 0, 2, 2), (1, 1, 3, 3)) == 0.0
    # Horizontally separated
    assert ct_utils.rect_distance((0, 0, 1, 1), (3, 0, 4, 1)) == 2.0
    # Diagonally separated
    assert ct_utils.rect_distance((0, 0, 1, 1), (4, 5, 6, 7)) == 5.0
    # MD-style format
    assert ct_utils.rect_distance((0, 0, 1, 1), (3, 0, 1, 1),
                                  format='x0y0wh') == 2.0


def test_get_max_conf():
    assert ct_utils.get_max_conf({'detections': None}) == 0.0
    assert ct_utils.get_max_conf({}) == 0.0
    im = {'detections': [{'conf': 0.1}, {'conf': 0.9}, {'conf': 0.5}]}
    assert ct_utils.get_max_conf(im) == 0.9


def test_sort_results_for_image():
    im = {'detections': [
        {'conf': 0.1, 'classifications': [['1', 0.2], ['2', 0.9]]},
        {'conf': 0.9},
    ]}
    ct_utils.sort_results_for_image(im)
    assert im['detections'][0]['conf'] == 0.9
    assert im['detections'][1]['classifications'][0][1] == 0.9


def test_list_chunking():
    L = list(range(10))
    chunks = ct_utils.split_list_into_fixed_size_chunks(L, 3)
    assert chunks == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]

    chunks = ct_utils.split_list_into_n_chunks(L, 3)
    assert len(chunks) == 3
    assert sum(len(c) for c in chunks) == 10
    assert [x for c in chunks for x in c] == L  # greedy keeps order

    chunks = ct_utils.split_list_into_n_chunks(L, 3,
                                               chunk_strategy='balanced')
    assert sorted(x for c in chunks for x in c) == L


def test_sort_list_of_dicts_by_key():
    L = [{'a': 3}, {'a': 1}, {'a': None}, {'a': 2}]
    out = ct_utils.sort_list_of_dicts_by_key(L, 'a')
    assert out[0]['a'] is None
    assert [d['a'] for d in out[1:]] == [1, 2, 3]
    out = ct_utils.sort_list_of_dicts_by_key(L, 'a', reverse=True)
    assert [d['a'] for d in out[:3]] == [3, 2, 1]
    assert out[-1]['a'] is None


def test_dict_sorting_and_inversion():
    d = {'b': 2, 'a': 1, 'c': 0}
    assert list(ct_utils.sort_dictionary_by_key(d).keys()) == ['a', 'b', 'c']
    assert list(ct_utils.sort_dictionary_by_value(d).keys()) == \
        ['c', 'a', 'b']
    inv = ct_utils.invert_dictionary({'x': 1, 'y': 2}, verify_unique=True)
    assert inv == {1: 'x', 2: 'y'}
    with pytest.raises(AssertionError):
        ct_utils.invert_dictionary({'x': 1, 'y': 1}, verify_unique=True)


def test_is_list_sorted():
    assert ct_utils.is_list_sorted([1, 2, 3])
    assert not ct_utils.is_list_sorted([3, 1, 2])
    assert ct_utils.is_list_sorted([3, 2, 1], reverse=True)


def test_parse_kvp():
    assert ct_utils.parse_kvp('a=b') == ('a', 'b')
    assert ct_utils.parse_kvp('flag') == ('flag', '')
    d = ct_utils.parse_kvp_list(['a=1', 'b=2', 'c'])
    assert d == {'a': '1', 'b': '2', 'c': ''}
    assert ct_utils.parse_kvp_list(None) == {}


def test_write_json(tmp_path):
    path = os.path.join(str(tmp_path), 'sub', 'out.json')
    content = {'b': 1, 'a': [1.5, 'x'], 'dt': None}
    ct_utils.write_json(path, content)
    with open(path) as f:
        assert json.load(f) == content
    # indent=1 single-space formatting
    with open(path) as f:
        text = f.read()
    assert text.startswith('{\n "')


def test_write_json_force_str(tmp_path):
    import datetime
    path = os.path.join(str(tmp_path), 'out.json')
    content = {'dt': datetime.datetime(2026, 1, 2, 3, 4, 5)}
    ct_utils.write_json(path, content, force_str=True,
                        serialize_datetimes=True)
    with open(path) as f:
        loaded = json.load(f)
    assert loaded['dt'] == '2026-01-02T03:04:05'


def test_args_to_object():
    import argparse
    ns = argparse.Namespace(foo=1, bar='x')

    class Opts:
        foo = 0
        bar = ''
        baz = 7

    opts = Opts()
    ct_utils.args_to_object(ns, opts)
    assert opts.foo == 1 and opts.bar == 'x' and opts.baz == 7


def test_misc_predicates():
    assert ct_utils.is_empty(None)
    assert ct_utils.is_empty('  ')
    assert not ct_utils.is_empty('x')
    assert ct_utils.is_empty(float('nan'))
    assert ct_utils.min_none(None, 3) == 3
    assert ct_utils.max_none(4, None) == 4
    assert ct_utils.min_none(2, 3) == 2
    assert ct_utils.isnan(float('nan'))
    assert not ct_utils.isnan('x')
    assert ct_utils.compare_values_nan_equal(float('nan'), float('nan'))
    assert ct_utils.to_bool('Yes') is True
    assert ct_utils.to_bool('0') is False
    assert ct_utils.to_bool('junk') is None


def test_round_floats_in_nested_dict():
    obj = {'a': 0.123456789, 'b': [0.987654321, {'c': 1.111111111}]}
    out = ct_utils.round_floats_in_nested_dict(obj, 3)
    assert out['a'] == 0.123
    assert out['b'][0] == 0.988
    assert out['b'][1]['c'] == 1.111


def test_image_file_to_camera_folder():
    assert ct_utils.image_file_to_camera_folder(
        'a/b/RECNX101/img.jpg') == 'a/b'
    assert ct_utils.image_file_to_camera_folder(
        'a/b/DCIM/100EK113/img.jpg') == 'a/b'
    assert ct_utils.image_file_to_camera_folder('a/b/img.jpg') == 'a/b'
