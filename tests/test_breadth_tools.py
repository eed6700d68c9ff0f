"""Tests for plot utils, video visualization, XMP, model metadata,
species lookup, and LILA helpers."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def test_precision_recall_and_ap():
    from megadetector_tpu.visualization.plot_utils import (
        average_precision, expected_calibration_error,
        precision_recall_curve)

    # Perfect ranking -> AP 1.0
    y_true = [1, 1, 1, 0, 0, 0]
    y_scores = [0.9, 0.8, 0.7, 0.3, 0.2, 0.1]
    assert average_precision(y_true, y_scores) == pytest.approx(1.0)

    # Inverted ranking -> low AP
    ap = average_precision(y_true, y_scores[::-1])
    assert ap < 0.6

    p, r, t = precision_recall_curve(y_true, y_scores)
    assert r[-1] == 1.0
    assert p[0] == 1.0

    # Perfectly-calibrated binary predictions: ECE 0 for {0,1} scores
    ece = expected_calibration_error([1, 0, 1, 0],
                                     [1.0, 0.0, 1.0, 0.0])
    assert ece == pytest.approx(0.0)
    # Confident but wrong: high ECE
    ece = expected_calibration_error([0, 0], [0.95, 0.95])
    assert ece > 0.9


def test_plot_files(tmp_path):
    pytest.importorskip('matplotlib')
    from megadetector_tpu.visualization.plot_utils import (
        plot_calibration_curve, plot_confidence_histogram,
        plot_precision_recall_curve)
    y_true = [1, 1, 0, 0]
    y_scores = [0.9, 0.6, 0.4, 0.1]
    pr_file = str(tmp_path / 'pr.png')
    plot_precision_recall_curve(y_true, y_scores, pr_file)
    assert os.path.getsize(pr_file) > 0
    cal_file = str(tmp_path / 'cal.png')
    plot_calibration_curve(y_true, y_scores, cal_file)
    assert os.path.getsize(cal_file) > 0
    hist_file = str(tmp_path / 'hist.png')
    plot_confidence_histogram(y_scores, hist_file)
    assert os.path.getsize(hist_file) > 0


def test_visualize_video_output(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from megadetector_tpu.visualization.visualize_video_output import \
        visualize_video_output

    video_folder = str(tmp_path / 'videos')
    os.makedirs(video_folder)
    rng = np.random.RandomState(0)
    path = os.path.join(video_folder, 'v.mp4')
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 5.0,
                          (64, 48))
    for _ in range(6):
        out.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    out.release()

    results = {'images': [{
        'file': 'v.mp4', 'frame_rate': 5.0, 'frames_processed': [0, 3],
        'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.3, 0.3],
             'frame_number': 0},
            {'category': '1', 'conf': 0.8, 'bbox': [0.4, 0.4, 0.2, 0.2],
             'frame_number': 3}]}],
        'detection_categories': {'1': 'animal'}, 'info': {}}
    results_file = str(tmp_path / 'videos.json')
    ct_utils.write_json(results_file, results)

    outputs = visualize_video_output(
        results_file, video_folder, str(tmp_path / 'out'))
    assert len(outputs) == 1
    assert os.path.isfile(outputs[0])
    assert os.path.getsize(outputs[0]) > 0


def test_xmp_integration(tmp_path):
    from megadetector_tpu.integration.xmp_integration import \
        write_results_to_xmp

    image_folder = str(tmp_path / 'images')
    os.makedirs(image_folder)
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
        os.path.join(image_folder, 'a.jpg'))
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
        os.path.join(image_folder, 'b.jpg'))

    results = {'images': [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['0', 0.8]]}]},
        {'file': 'b.jpg', 'detections': []},
    ], 'detection_categories': {'1': 'animal'},
        'classification_categories': {'0': 'deer'}, 'info': {}}
    results_file = str(tmp_path / 'r.json')
    ct_utils.write_json(results_file, results)

    written = write_results_to_xmp(results_file, image_folder)
    assert len(written) == 2
    a_xmp = open(os.path.join(image_folder, 'a.xmp')).read()
    assert 'MegaDetector|animal' in a_xmp
    assert 'MegaDetector|animal|deer' in a_xmp
    b_xmp = open(os.path.join(image_folder, 'b.xmp')).read()
    assert 'MegaDetector|empty' in b_xmp


def test_add_metadata_to_model_file(tmp_path):
    import zipfile
    from megadetector_tpu.models.registry import (
        add_metadata_to_model_file, read_metadata_from_model_file)

    # npz sidecar path
    npz_path = str(tmp_path / 'm.npz')
    np.savez(npz_path, x=np.zeros(3))
    add_metadata_to_model_file(npz_path, {
        'model_version_string': 'v5a.0.1'})
    meta = read_metadata_from_model_file(npz_path)
    assert meta['model_version_string'] == 'v5a.0.1'

    # .pt zipfile path
    pt_path = str(tmp_path / 'm.pt')
    with zipfile.ZipFile(pt_path, 'w') as zf:
        zf.writestr('archive/data.pkl', b'x')
    add_metadata_to_model_file(pt_path, {
        'model_version_string': 'v5b.0.1',
        'metadata_format_version': 1.0})
    meta = read_metadata_from_model_file(pt_path)
    assert meta['model_version_string'] == 'v5b.0.1'


def test_species_lookup():
    from megadetector_tpu.taxonomy_mapping.species_lookup import \
        SpeciesLookup

    rows = [
        ('1', 'family', 'cervidae', None),
        ('2', 'species', 'white tailed deer', '1'),
        ('3', 'species', 'mule deer', '1'),
    ]
    lookup = SpeciesLookup(rows, synonyms={'whitetail':
                                           'white tailed deer'})
    assert lookup.lookup_name('White Tailed Deer') == 'white tailed deer'
    assert lookup.lookup_name('whitetail') == 'white tailed deer'
    # Fuzzy: hyphens and token subsets
    assert lookup.lookup_name('white-tailed deer') == 'white tailed deer'
    assert lookup.lookup_name('zebra') is None
    mapped = lookup.map_labels(['mule deer', 'zebra'])
    assert mapped == {'mule deer': 'mule deer', 'zebra': None}


def test_lila_helpers(tmp_path):
    from megadetector_tpu.data_management.lila.lila_common import (
        generate_lila_per_image_labels, get_lila_dataset_index,
        lila_image_url)

    # Offline index
    index_csv = str(tmp_path / 'index.csv')
    with open(index_csv, 'w') as f:
        f.write('name,json_url,image_base_url\n')
        f.write('Test Dataset,https://example/x.json,'
                'https://example/images/\n')
    index = get_lila_dataset_index(local_index_file=index_csv)
    assert 'Test Dataset' in index
    url = lila_image_url(index['Test Dataset'], 'loc/im.jpg')
    assert url == 'https://example/images/loc/im.jpg'

    cct = {'images': [
        {'id': 'im0', 'file_name': 'a.jpg', 'location': 'loc1'}],
        'annotations': [
            {'id': 0, 'image_id': 'im0', 'category_id': 1}],
        'categories': [{'id': 1, 'name': 'deer'}]}
    records = generate_lila_per_image_labels(cct)
    assert records[0]['labels'] == ['deer']


def test_lila_subset_download_mapping(tmp_path):
    from megadetector_tpu.data_management.lila.lila_common import (
        download_lila_subset, select_lila_images_by_species)

    cct = {'images': [
        {'id': 'im0', 'file_name': 'loc1/a.jpg'},
        {'id': 'im1', 'file_name': 'loc2/b.jpg'},
        {'id': 'im2', 'file_name': 'loc1/c.jpg'}],
        'annotations': [
            {'id': 0, 'image_id': 'im0', 'category_id': 1},
            {'id': 1, 'image_id': 'im1', 'category_id': 2},
            {'id': 2, 'image_id': 'im2', 'category_id': 1}],
        'categories': [{'id': 1, 'name': 'Deer'},
                       {'id': 2, 'name': 'empty'}]}
    cct_file = str(tmp_path / 'cct.json')
    import json
    with open(cct_file, 'w') as f:
        json.dump(cct, f)

    files = select_lila_images_by_species(cct_file, ['deer'])
    assert sorted(files) == ['loc1/a.jpg', 'loc1/c.jpg']

    entry = {'image_base_url': 'https://example/images/'}
    mapping = download_lila_subset(entry, files, str(tmp_path / 'out'),
                                   dry_run=True)
    assert 'https://example/images/loc1/a.jpg' in mapping
    import os
    assert mapping['https://example/images/loc1/a.jpg'] == \
        os.path.join(str(tmp_path / 'out'), 'loc1/a.jpg')
