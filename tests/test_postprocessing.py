"""Tests for the postprocessing ecosystem (host-side tools)."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def _make_results(tmp_path, images=None, categories=None, name='r.json'):
    if categories is None:
        categories = {'1': 'animal', '2': 'person', '3': 'vehicle'}
    if images is None:
        images = [
            {'file': 'cam1/a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2]},
                {'category': '2', 'conf': 0.15,
                 'bbox': [0.5, 0.5, 0.1, 0.1]}]},
            {'file': 'cam1/b.jpg', 'detections': []},
            {'file': 'cam2/c.jpg', 'detections': [
                {'category': '3', 'conf': 0.6,
                 'bbox': [0.2, 0.2, 0.3, 0.3]}]},
            {'file': 'cam2/d.jpg', 'detections': None,
             'failure': 'image access failure'},
        ]
    data = {'images': images,
            'detection_categories': categories,
            'info': {'format_version': '1.6', 'detector': 'test',
                     'detector_metadata': {
                         'typical_detection_threshold': 0.2}}}
    path = str(tmp_path / name)
    ct_utils.write_json(path, data)
    return path, data


def test_validator_catches_errors(tmp_path):
    from megadetector_tpu.postprocessing.validate_batch_results import (
        ValidateBatchResultsOptions, validate_batch_results)

    bad_images = [
        {'file': 'a.jpg', 'detections': [
            {'category': '9', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'a.jpg', 'detections': []},  # duplicate
        {'file': 'b.jpg', 'detections': None},  # null without failure
        {'file': 'c.jpg', 'detections': [
            {'category': '1', 'conf': 1.5, 'bbox': [0.1, 0.1, 0.2]}]},
    ]
    path, _ = _make_results(tmp_path, images=bad_images)
    out = validate_batch_results(path)
    errors = out['validation_results']['validation_errors']
    assert len(errors) >= 4


def test_validator_clean_file(tmp_path):
    from megadetector_tpu.postprocessing.validate_batch_results import (
        validate_batch_results)
    path, _ = _make_results(tmp_path)
    out = validate_batch_results(path)
    assert out['validation_results']['validation_errors'] == []


def test_load_api_results(tmp_path):
    pd = pytest.importorskip('pandas')
    from megadetector_tpu.postprocessing.load_api_results import (
        load_api_results, write_api_results)
    path, data = _make_results(tmp_path)
    df, other = load_api_results(path)
    assert len(df) == 4
    assert 'detection_categories' in other
    assert df['max_detection_conf'].max() == 0.9
    out_path = str(tmp_path / 'rt.json')
    write_api_results(df, other, out_path)
    with open(out_path) as f:
        rt = json.load(f)
    assert len(rt['images']) == 4


def test_combine_batch_outputs(tmp_path):
    from megadetector_tpu.postprocessing.combine_batch_outputs import (
        combine_batch_output_files)
    p1, d1 = _make_results(tmp_path, name='r1.json')
    images2 = [{'file': 'cam3/e.jpg', 'detections': []}]
    p2, d2 = _make_results(tmp_path, images=images2, name='r2.json')
    out = str(tmp_path / 'merged.json')
    merged = combine_batch_output_files([p1, p2], out)
    assert len(merged['images']) == 5
    # Duplicates raise
    with pytest.raises(ValueError):
        combine_batch_output_files([p1, p1], None)


def test_subset_by_query_and_confidence(tmp_path):
    from megadetector_tpu.postprocessing.subset_json_detector_output import (
        SubsetJsonDetectorOutputOptions, subset_json_detector_output)
    path, _ = _make_results(tmp_path)

    options = SubsetJsonDetectorOutputOptions()
    options.query = 'cam1'
    options.replacement = 'camera_one'
    out = subset_json_detector_output(path, None, options)
    assert len(out['images']) == 2
    assert all(im['file'].startswith('camera_one') for im in out['images'])

    options = SubsetJsonDetectorOutputOptions()
    options.confidence_threshold = 0.5
    out = subset_json_detector_output(path, None, options)
    a = [im for im in out['images'] if im['file'] == 'cam1/a.jpg'][0]
    assert len(a['detections']) == 1  # the 0.15 person is dropped

    options = SubsetJsonDetectorOutputOptions()
    options.remove_failed_images = True
    out = subset_json_detector_output(path, None, options)
    assert len(out['images']) == 3


def test_subset_split_folders(tmp_path):
    from megadetector_tpu.postprocessing.subset_json_detector_output import (
        SubsetJsonDetectorOutputOptions, subset_json_detector_output)
    path, _ = _make_results(tmp_path)
    out_dir = str(tmp_path / 'split')
    os.makedirs(out_dir)
    options = SubsetJsonDetectorOutputOptions()
    options.split_folders = True
    options.make_folder_relative = True
    options.overwrite_json_files = True
    out = subset_json_detector_output(path, out_dir, options)
    assert set(out.keys()) == {'cam1', 'cam2'}
    assert os.path.isfile(os.path.join(out_dir, 'cam1.json'))
    with open(os.path.join(out_dir, 'cam1.json')) as f:
        cam1 = json.load(f)
    assert all('/' not in im['file'] for im in cam1['images'])


def test_separate_detections_into_folders(tmp_path):
    from megadetector_tpu.postprocessing.separate_detections_into_folders \
        import (SeparateDetectionsIntoFoldersOptions,
                separate_detections_into_folders)

    # Build an image tree matching the results
    input_folder = str(tmp_path / 'input')
    rng = np.random.RandomState(0)
    for fn in ['cam1/a.jpg', 'cam1/b.jpg', 'cam2/c.jpg', 'cam2/d.jpg']:
        p = os.path.join(input_folder, fn)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (20, 20, 3),
                                    dtype=np.uint8)).save(p)

    path, _ = _make_results(tmp_path)
    options = SeparateDetectionsIntoFoldersOptions(threshold=0.2)
    options.results_file = path
    options.base_input_folder = input_folder
    options.base_output_folder = str(tmp_path / 'out')
    options.n_threads = 1
    separate_detections_into_folders(options)

    base = str(tmp_path / 'out')
    assert os.path.isfile(os.path.join(base, 'animals', 'cam1/a.jpg'))
    assert os.path.isfile(os.path.join(base, 'empty', 'cam1/b.jpg'))
    assert os.path.isfile(os.path.join(base, 'vehicles', 'cam2/c.jpg'))
    assert os.path.isfile(os.path.join(base, 'failures', 'cam2/d.jpg'))


def test_convert_output_format_round_trip(tmp_path):
    from megadetector_tpu.postprocessing.convert_output_format import (
        convert_json_to_csv, convert_csv_to_json)
    path, data = _make_results(tmp_path)
    csv_path = convert_json_to_csv(path)
    assert os.path.isfile(csv_path)
    json_path = convert_csv_to_json(csv_path,
                                    str(tmp_path / 'round_trip.json'))
    with open(json_path) as f:
        rt = json.load(f)
    assert len(rt['images']) == 4
    a = [im for im in rt['images'] if im['file'] == 'cam1/a.jpg'][0]
    assert len(a['detections']) == 2
    d = [im for im in rt['images'] if im['file'] == 'cam2/d.jpg'][0]
    assert d['detections'] is None


def test_merge_detections(tmp_path):
    from megadetector_tpu.postprocessing.merge_detections import (
        MergeDetectionsOptions, merge_detections)
    target_path, _ = _make_results(tmp_path, name='target.json')
    source_images = [
        {'file': 'cam1/a.jpg', 'detections': [
            # Same box as target's animal -> duplicate, skipped
            {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            # New box -> merged
            {'category': '1', 'conf': 0.7, 'bbox': [0.7, 0.7, 0.2, 0.2]},
        ]},
    ]
    source_path, _ = _make_results(tmp_path, images=source_images,
                                   name='source.json')
    out_path = str(tmp_path / 'merged.json')
    options = MergeDetectionsOptions()
    options.source_confidence_thresholds = [0.5]
    merged = merge_detections(source_path, target_path, out_path, options)
    a = [im for im in merged['images'] if im['file'] == 'cam1/a.jpg'][0]
    assert len(a['detections']) == 3
    transferred = [d for d in a['detections'] if 'transferred_from' in d]
    assert len(transferred) == 1
    assert transferred[0]['bbox'] == [0.7, 0.7, 0.2, 0.2]


def test_remap_detection_categories(tmp_path):
    from megadetector_tpu.postprocessing.remap_detection_categories import (
        remap_detection_categories)
    path, _ = _make_results(tmp_path)
    target_map = {'1': 'person', '2': 'animal', '3': 'vehicle'}
    out = remap_detection_categories(path, None, target_map)
    # animal moved from id 1 to id 2
    a = [im for im in out['images'] if im['file'] == 'cam1/a.jpg'][0]
    cats = sorted(d['category'] for d in a['detections'])
    assert cats == ['1', '2']  # person (was 2->1), animal (was 1->2)
    assert out['detection_categories'] == target_map


def test_categorize_detections_by_size(tmp_path):
    from megadetector_tpu.postprocessing.categorize_detections_by_size \
        import SizeCategorizationOptions, categorize_detections_by_size
    images = [{'file': 'x.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.0, 0.0, 0.99, 0.99]},
        {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2]},
    ]}]
    path, _ = _make_results(tmp_path, images=images)
    options = SizeCategorizationOptions()
    options.size_thresholds = [0.9]
    out = categorize_detections_by_size(path, None, options)
    dets = out['images'][0]['detections']
    assert dets[0]['category'] == '4'  # recategorized
    assert dets[1]['category'] == '1'
    assert '4' in out['detection_categories']


def test_add_max_conf(tmp_path):
    from megadetector_tpu.postprocessing.add_max_conf import add_max_conf
    path, _ = _make_results(tmp_path)
    out = add_max_conf(path, None)
    by_file = {im['file']: im for im in out['images']}
    assert by_file['cam1/a.jpg']['max_detection_conf'] == 0.9
    assert by_file['cam1/b.jpg']['max_detection_conf'] == 0.0
    assert by_file['cam2/d.jpg']['max_detection_conf'] == 0.0
