"""Tests for repeat detection elimination."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.postprocessing.repeat_detection_elimination import (
    repeat_detections_core as rde)
from megadetector_tpu.utils import ct_utils


def _repeat_box():
    return [0.40, 0.40, 0.10, 0.10]


def _make_rde_scenario(tmp_path, n_repeat_images=25, write_images=False):
    """
    Location cam1: the same small box appears in n_repeat_images images
    (a 'rock'), plus one moving animal. Location cam2: a few scattered
    detections.
    """

    images = []
    for i in range(n_repeat_images):
        dets = [{'category': '1', 'conf': 0.5 + 0.001 * i,
                 'bbox': list(_repeat_box())}]
        if i == 0:
            dets.append({'category': '1', 'conf': 0.9,
                         'bbox': [0.7, 0.1, 0.15, 0.15]})
        images.append({'file': 'cam1/im_{:03d}.jpg'.format(i),
                       'detections': dets})
    for i in range(3):
        images.append({'file': 'cam2/im_{:03d}.jpg'.format(i),
                       'detections': [
                           {'category': '1', 'conf': 0.8,
                            'bbox': [0.1 * i + 0.05, 0.2, 0.1, 0.1]}]})

    data = {'images': images,
            'detection_categories': {'1': 'animal', '2': 'person',
                                     '3': 'vehicle'},
            'info': {'format_version': '1.6'}}
    path = str(tmp_path / 'results.json')
    ct_utils.write_json(path, data)

    image_base = str(tmp_path / 'images')
    if write_images:
        rng = np.random.RandomState(0)
        for im in images:
            p = os.path.join(image_base, im['file'])
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(rng.randint(0, 255, (40, 60, 3),
                                        dtype=np.uint8)).save(p)
    return path, image_base, data


def test_grid_index():
    index = rde.GridIndex(cell_size=0.1)
    a = {'name': 'a'}
    index.insert([0.1, 0.1, 0.05, 0.05], a)
    index.insert([0.8, 0.8, 0.05, 0.05], {'name': 'b'})
    hits = index.query([0.09, 0.09, 0.06, 0.06])
    assert any(h['name'] == 'a' for h in hits)
    assert not any(h['name'] == 'b' for h in hits)
    assert len(index.all_items()) == 2


def test_find_matches_clusters_identical_boxes():
    images = [{'file': 'a/{}.jpg'.format(i),
               'detections': [{'category': '1', 'conf': 0.5,
                               'bbox': list(_repeat_box())}]}
              for i in range(5)]
    options = rde.RepeatDetectionOptions()
    candidates = rde._find_matches_in_directory('a', images, options)
    assert len(candidates) == 1
    assert len(candidates[0]['instances']) == 5


def test_find_matches_respects_category():
    images = [
        {'file': 'a/0.jpg', 'detections': [
            {'category': '1', 'conf': 0.5, 'bbox': list(_repeat_box())}]},
        {'file': 'a/1.jpg', 'detections': [
            {'category': '2', 'conf': 0.5, 'bbox': list(_repeat_box())}]},
    ]
    options = rde.RepeatDetectionOptions()
    candidates = rde._find_matches_in_directory('a', images, options)
    assert len(candidates) == 2

    options.categoryAgnosticComparisons = True
    candidates = rde._find_matches_in_directory('a', images, options)
    assert len(candidates) == 1


def test_find_matches_size_limits():
    # A huge box is never suspicious (default max size 0.2)
    images = [{'file': 'a/{}.jpg'.format(i),
               'detections': [{'category': '1', 'conf': 0.5,
                               'bbox': [0.1, 0.1, 0.8, 0.8]}]}
              for i in range(5)]
    options = rde.RepeatDetectionOptions()
    candidates = rde._find_matches_in_directory('a', images, options)
    assert len(candidates) == 0


def test_find_repeat_detections_end_to_end(tmp_path):
    path, image_base, _ = _make_rde_scenario(tmp_path)

    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20
    options.bWriteFilteringFolder = False
    options.nWorkers = 1

    output = str(tmp_path / 'filtered.json')
    results = rde.find_repeat_detections(path, output, options)

    assert 'cam1' in results.suspicious_detections
    assert 'cam2' not in results.suspicious_detections

    with open(output) as f:
        filtered = json.load(f)
    by_file = {im['file']: im for im in filtered['images']}

    # The repeated box got a negative confidence in every cam1 image
    for i in range(25):
        im = by_file['cam1/im_{:03d}.jpg'.format(i)]
        assert im['detections'][0]['conf'] < 0
    # The genuine animal kept its confidence
    assert by_file['cam1/im_000.jpg']['detections'][1]['conf'] == 0.9
    # cam2 untouched
    for i in range(3):
        im = by_file['cam2/im_{:03d}.jpg'.format(i)]
        assert im['detections'][0]['conf'] > 0


def test_occurrence_threshold(tmp_path):
    path, _, _ = _make_rde_scenario(tmp_path, n_repeat_images=10)
    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20  # more than the 10 occurrences
    options.bWriteFilteringFolder = False
    options.nWorkers = 1
    results = rde.find_repeat_detections(path, None, options)
    assert len(results.suspicious_detections) == 0


def test_filtering_folder_and_removal(tmp_path):
    from megadetector_tpu.postprocessing.repeat_detection_elimination \
        .remove_repeat_detections import remove_repeat_detections

    path, image_base, _ = _make_rde_scenario(tmp_path, write_images=True)

    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20
    options.imageBase = image_base
    options.outputBase = str(tmp_path / 'rde_output')
    options.nWorkers = 1

    results = rde.find_repeat_detections(path, None, options)
    assert results.filter_file is not None
    filter_folder = os.path.dirname(results.filter_file)
    rendered = [f for f in os.listdir(filter_folder)
                if f.endswith('.jpg')]
    assert len(rendered) == 1  # one suspicious group

    # Human leaves the rendering in place (confirming it's a false
    # positive); apply the filter
    output = str(tmp_path / 'after_review.json')
    remove_repeat_detections(path, output, filter_folder)
    with open(output) as f:
        filtered = json.load(f)
    by_file = {im['file']: im for im in filtered['images']}
    assert by_file['cam1/im_005.jpg']['detections'][0]['conf'] < 0

    # Human deletes the rendering (it was a real animal): nothing flipped
    for f in rendered:
        os.remove(os.path.join(filter_folder, f))
    output2 = str(tmp_path / 'after_review2.json')
    remove_repeat_detections(path, output2, filter_folder)
    with open(output2) as f:
        filtered2 = json.load(f)
    by_file2 = {im['file']: im for im in filtered2['images']}
    assert by_file2['cam1/im_005.jpg']['detections'][0]['conf'] > 0


def test_dir_levels_from_leaf():
    options = rde.RepeatDetectionOptions()
    assert rde.image_file_to_location('a/b/c/x.jpg', options) == 'a/b/c'
    options.nDirLevelsFromLeaf = 1
    assert rde.image_file_to_location('a/b/c/x.jpg', options) == 'a/b'
    options.nDirLevelsFromLeaf = 0
    options.customDirNameFunction = lambda fn: 'fixed'
    assert rde.image_file_to_location('a/b/c/x.jpg', options) == 'fixed'


def test_parallel_process_pool_matches_serial(tmp_path):
    """parallelizationUsesThreads=False must use a real process pool and
    produce the same candidates as the serial path (review-batch-4
    finding 6)."""

    path, _, _ = _make_rde_scenario(tmp_path)

    serial = rde.RepeatDetectionOptions()
    serial.occurrenceThreshold = 20
    serial.bParallelizeComparisons = False
    r_serial = rde.find_repeat_detections(path, None, serial)

    par = rde.RepeatDetectionOptions()
    par.occurrenceThreshold = 20
    par.bParallelizeComparisons = True
    par.parallelizationUsesThreads = False
    par.nWorkers = 2
    r_par = rde.find_repeat_detections(path, None, par)

    def _keys(results):
        return sorted(
            (loc, c['category'], tuple(c['bbox']), len(c['instances']))
            for loc, cands in results.suspicious_detections.items()
            for c in cands)
    assert _keys(r_serial) == _keys(r_par)
    assert len(_keys(r_par)) == 1


def test_render_other_detections(tmp_path):
    """bRenderOtherDetections must render context boxes without
    breaking the filtering folder (review-batch-4 finding 9)."""

    path, image_base, _ = _make_rde_scenario(tmp_path, write_images=True)

    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20
    options.imageBase = image_base
    options.outputBase = str(tmp_path / 'rde_output')
    options.nWorkers = 1
    options.bRenderOtherDetections = True
    options.otherDetectionsThreshold = 0.2

    results = rde.find_repeat_detections(path, None, options)
    assert results.filter_file is not None
    filter_folder = os.path.dirname(results.filter_file)
    rendered = [f for f in os.listdir(filter_folder)
                if f.endswith('.jpg')]
    assert len(rendered) == 1


def test_smart_sort_xsort_and_clustersort():
    """smartSort orders candidates by box-center x (xsort) or by
    x-ordered spatial clusters (clustersort) for faster human review
    (reference: repeat_detections_core.py:463-558)."""

    def cand(x, y):
        return {'bbox': [x, y, 0.1, 0.1], 'category': '1',
                'relative_dir': 'cam1', 'instances': []}

    candidates = [cand(0.8, 0.1), cand(0.1, 0.5), cand(0.45, 0.3)]

    options = rde.RepeatDetectionOptions()
    options.smartSort = 'xsort'
    xs = [c['bbox'][0] for c in
          rde._sort_candidates_for_directory(list(candidates), options)]
    assert xs == [0.1, 0.45, 0.8]

    # Two tight clusters (around x~0.1 and x~0.8): clustersort must
    # emit all of the left cluster before any of the right one
    clustered = [cand(0.80, 0.1), cand(0.10, 0.5), cand(0.12, 0.52),
                 cand(0.82, 0.12)]
    options.smartSort = 'clustersort'
    options.smartSortDistanceThreshold = 0.1
    out = rde._sort_candidates_for_directory(list(clustered), options)
    xs = [c['bbox'][0] for c in out]
    assert set(xs[:2]) == {0.10, 0.12} and set(xs[2:]) == {0.80, 0.82}

    options.smartSort = None
    assert rde._sort_candidates_for_directory(
        list(candidates), options) == candidates

    options.smartSort = 'bogus'
    with pytest.raises(ValueError):
        rde._sort_candidates_for_directory(list(candidates), options)


def test_detection_tiles_and_filename_replacements(tmp_path):
    """bRenderDetectionTiles composites the instance crops beside the
    sample image; filenameReplacements remaps image paths before
    opening them (reference: repeat_detections_core.py:199,1053-1095)."""

    path, image_base, _ = _make_rde_scenario(tmp_path, write_images=True)

    # Move the images so only a path replacement can find them
    moved_base = str(tmp_path / 'moved')
    os.rename(os.path.join(image_base, 'cam1'),
              os.path.join(os.makedirs(moved_base, exist_ok=True) or
                           moved_base, 'cam1_moved'))

    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20
    options.imageBase = moved_base
    options.outputBase = str(tmp_path / 'rde_tiles')
    options.nWorkers = 1
    options.bRenderDetectionTiles = True
    options.detectionTilesMaxCrops = 5
    options.filenameReplacements = {'cam1/': 'cam1_moved/'}
    options.bFailOnRenderError = True

    results = rde.find_repeat_detections(path, None, options)
    folder = os.path.dirname(results.filter_file)
    rendered = [f for f in os.listdir(folder) if f.endswith('.jpg')]
    assert len(rendered) == 1
    composite = Image.open(os.path.join(folder, rendered[0]))
    # The composite is wider than the 60px source (primary + crop grid)
    assert composite.size[0] > 60


def test_fail_on_render_error(tmp_path):
    """bFailOnRenderError surfaces rendering failures instead of
    converting them to warnings."""

    path, image_base, _ = _make_rde_scenario(tmp_path, write_images=False)

    options = rde.RepeatDetectionOptions()
    options.occurrenceThreshold = 20
    options.imageBase = str(tmp_path / 'nonexistent')
    options.outputBase = str(tmp_path / 'rde_fail')
    options.nWorkers = 1
    options.bParallelizeRendering = False
    options.bFailOnRenderError = True

    with pytest.raises(Exception):
        rde.find_repeat_detections(path, None, options)
