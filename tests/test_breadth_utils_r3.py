"""
Tests for round-3 breadth utilities: batch resize, image sizes,
integrity checking, GPS/datetime EXIF helpers, URL sizes, and WSL path
conversions.
"""

import os

import numpy as np

from PIL import Image

from megadetector_tpu.visualization import visualization_utils as vu


def _make_images(folder, sizes):
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate(sizes):
        p = os.path.join(str(folder), 'im_{}.jpg'.format(i))
        Image.fromarray(rng.randint(0, 255, (h, w, 3),
                                    dtype=np.uint8)).save(p)
        paths.append(p)
    return paths


def test_resize_images_and_folder(tmp_path):
    src = tmp_path / 'src'
    src.mkdir()
    paths = _make_images(src, [(100, 80), (50, 40)])
    out = str(tmp_path / 'out')
    mapping = {p: os.path.join(out, os.path.basename(p))
               for p in paths}
    results = vu.resize_images(mapping, target_width=50)
    for p, r in results.items():
        assert not str(r).startswith('error')
        with Image.open(mapping[p]) as im:
            assert im.size[0] == 50

    # Folder form, in a parallel tree, aspect preserved
    out2 = str(tmp_path / 'out2')
    results = vu.resize_image_folder(str(src), out2, target_width=25)
    assert len(results) == 2
    with Image.open(os.path.join(out2, 'im_0.jpg')) as im:
        assert im.size == (25, 20)

    # no_enlarge_width: target wider than source leaves size unchanged
    out3 = str(tmp_path / 'big.jpg')
    vu.resize_image(paths[1], target_width=500, output_file=out3,
                    no_enlarge_width=True)
    with Image.open(out3) as im:
        assert im.size == (50, 40)


def test_get_image_sizes(tmp_path):
    paths = _make_images(tmp_path, [(60, 40), (30, 20)])
    assert vu.get_image_size(paths[0]) == (60, 40)
    assert vu.get_image_size('/nonexistent.jpg') is None
    sizes = vu.parallel_get_image_sizes(str(tmp_path), max_workers=2)
    assert sorted(sizes.values()) == [(30, 20), (60, 40)]


def test_parallel_check_image_integrity(tmp_path):
    paths = _make_images(tmp_path, [(20, 20)])
    bad = str(tmp_path / 'bad.jpg')
    with open(bad, 'wb') as f:
        f.write(b'not a jpeg')
    results = vu.parallel_check_image_integrity(str(tmp_path))
    by_file = {r['file']: r for r in results}
    assert by_file[paths[0]]['load'] is True
    assert by_file[bad]['load'] is False


def test_gps_helpers():
    from megadetector_tpu.data_management import read_exif as re_

    tags = {'GPSLatitude': (47.0, 36.0, 0.0), 'GPSLatitudeRef': 'N',
            'GPSLongitude': (122.0, 19.0, 48.0),
            'GPSLongitudeRef': 'W', 'Make': 'TestCam'}
    info = re_.get_gps_info({'exif_tags': tags})
    assert info['status'] == 'success'
    assert 'GPSLatitude' in info['gps_info']
    assert 'Make' not in info['gps_info']
    lat, lon = re_.get_exif_lat_lon(tags)
    assert abs(lat - 47.6) < 1e-6 and abs(lon + 122.33) < 1e-2

    # Null island
    null_tags = {'GPSLatitude': (0.0, 0.0, 0.0), 'GPSLatitudeRef': 'N',
                 'GPSLongitude': (0.0, 0.0, 0.0),
                 'GPSLongitudeRef': 'E'}
    assert re_.get_gps_info({'exif_tags': null_tags})['status'] == \
        'null_island'
    assert re_.get_gps_info(
        {'exif_tags': null_tags},
        check_for_null_island=False)['status'] == 'success'

    # No GPS / no EXIF
    assert re_.get_gps_info({'exif_tags': {'Make': 'x'}})['status'] == \
        'no_gps_info'
    assert re_.get_gps_info({'exif_tags': {}})['status'] == \
        'no_exif_info'
    assert re_.has_gps_info({'exif_tags': tags}) is True
    assert re_.has_gps_info({'exif_tags': {'Make': 'x'}}) is False

    # Invalid refs / ranges
    bad = dict(tags, GPSLatitudeRef='Q')
    assert re_.get_exif_lat_lon(bad) is None
    far = dict(tags, GPSLatitude=(200.0, 0.0, 0.0))
    assert re_.get_exif_lat_lon(far) is None


def test_exif_datetime_roundtrip():
    from datetime import datetime
    from megadetector_tpu.data_management import read_exif as re_

    dt = datetime(2024, 3, 5, 14, 30, 59)
    s = re_.format_datetime_as_exif_datetime_string(dt)
    assert s == '2024:03:05 14:30:59'
    assert re_.parse_exif_datetime_string(s) == dt
    assert re_.parse_exif_datetime_string('garbage') is None


def test_read_exif_tags_for_image(tmp_path):
    from megadetector_tpu.data_management import read_exif as re_

    paths = _make_images(tmp_path, [(20, 20)])
    r = re_.read_exif_tags_for_image(paths[0])
    assert r['file'] == paths[0] and 'exif_tags' in r
    r = re_.read_exif_tags_for_image(str(tmp_path / 'missing.jpg'))
    assert 'error' in r


def test_url_sizes(tmp_path):
    import http.server
    import socketserver
    import threading
    from megadetector_tpu.utils import url_utils

    payload = b'x' * 1234
    with open(str(tmp_path / 'file.bin'), 'wb') as f:
        f.write(payload)

    handler = type('H', (http.server.SimpleHTTPRequestHandler,), {
        'directory': str(tmp_path),
        'log_message': lambda *a, **k: None})
    httpd = socketserver.TCPServer(
        ('127.0.0.1', 0),
        lambda *a, **k: handler(*a, directory=str(tmp_path), **k))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = 'http://127.0.0.1:{}/file.bin'.format(port)
        assert url_utils.get_url_size(url) == 1234
        sizes = url_utils.get_url_sizes(
            [url, 'http://127.0.0.1:{}/missing.bin'.format(port)])
        assert sizes[url] == 1234
        assert sizes['http://127.0.0.1:{}/missing.bin'.format(
            port)] is None
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_wsl_path_helpers():
    from megadetector_tpu.utils import ct_utils, path_utils

    assert path_utils.windows_path_to_wsl_path(
        'C:\\temp\\foo.txt') == '/mnt/c/temp/foo.txt'
    assert path_utils.windows_path_to_wsl_path(
        'relative/path') == 'relative/path'
    assert path_utils.wsl_path_to_windows_path(
        '/mnt/d/data') == 'd:\\data'
    assert path_utils.wsl_path_to_windows_path('/tmp/x') is None
    assert isinstance(ct_utils.environment_is_wsl(), bool)


def test_subset_by_list_and_category_count(tmp_path):
    from megadetector_tpu.postprocessing.subset_json_detector_output \
        import (SubsetJsonDetectorOutputOptions,
                remove_classification_categories_below_count,
                subset_json_detector_output_by_list)

    data = {
        'classification_categories': {'0': 'deer', '1': 'puma'},
        'classification_category_descriptions': {'0': 'd', '1': 'p'},
        'images': [
            {'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2],
                 'classifications': [['0', 0.8], ['1', 0.1]]}]},
            {'file': 'b.jpg', 'detections': [
                {'category': '1', 'conf': 0.8,
                 'bbox': [0.1, 0.1, 0.2, 0.2],
                 'classifications': [['0', 0.7]]}]},
            {'file': 'c.jpg', 'detections': None,
             'failure': 'image access failure'},
        ],
    }

    options = SubsetJsonDetectorOutputOptions()
    options.keep_files_in_list = ['a.jpg', 'c.jpg']
    import copy
    subset = subset_json_detector_output_by_list(
        copy.deepcopy(data), options)
    assert [im['file'] for im in subset['images']] == ['a.jpg', 'c.jpg']

    options = SubsetJsonDetectorOutputOptions()
    options.remove_classification_categories_below_count = 2
    pruned = remove_classification_categories_below_count(
        copy.deepcopy(data), options)
    assert list(pruned['classification_categories']) == ['0']
    assert list(pruned['classification_category_descriptions']) == ['0']
    dets = pruned['images'][0]['detections'][0]
    assert dets['classifications'] == [['0', 0.8]]


def test_validate_label_file(tmp_path):
    from megadetector_tpu.data_management.yolo_to_coco import \
        validate_label_file

    good = str(tmp_path / 'good.txt')
    with open(good, 'w') as f:
        f.write('# comment\n0 0.5 0.5 0.2 0.2\n1 0.9 0.9 0.1 0.1\n')
    assert validate_label_file(good)['errors'] == []
    assert validate_label_file(
        good, category_id_to_name={0: 'animal'})['errors'] != []

    bad = str(tmp_path / 'bad.txt')
    with open(bad, 'w') as f:
        f.write('0 0.5 0.5\n0 0.99 0.5 0.2 0.2\n')
    errors = validate_label_file(bad)['errors']
    assert len(errors) == 2
    assert 'five tokens' in errors[0]
    assert 'Invalid bounding box' in errors[1]

    assert validate_label_file(str(tmp_path / 'none.txt'))['errors']


def test_try_get_datetime_from_image(tmp_path):
    from datetime import datetime
    from megadetector_tpu.data_management import ocr_tools

    img = np.full((100, 200, 3), 255, dtype=np.uint8)
    img[:20, :, :] = 0  # solid banner where OCR text would live

    def ocr_fn(arr):
        return '2023-06-15 08:30:00'

    result = ocr_tools.try_get_datetime_from_image(img, ocr_fn=ocr_fn)
    assert result['datetime'] == datetime(2023, 6, 15, 8, 30, 0)
    assert result['options_index'] == 0

    def broken_ocr(arr):
        raise RuntimeError('ocr exploded')

    result = ocr_tools.try_get_datetime_from_image(img,
                                                   ocr_fn=broken_ocr)
    assert result['datetime'] is None
    assert 'ocr exploded' in result['error']


def test_typical_threshold_and_speed_estimate(tmp_path):
    from megadetector_tpu.detection import run_detector as rd

    # Metadata present in the file
    results = {'info': {'detector': 'md_v5a.0.0.pt',
                        'detector_metadata':
                            {'typical_detection_threshold': 0.17}},
               'images': []}
    assert rd.get_typical_confidence_threshold_from_results(
        results) == 0.17
    # Inferred from the detector filename
    results = {'info': {'detector': 'md_v5a.0.0.pt'}, 'images': []}
    assert rd.get_typical_confidence_threshold_from_results(
        results) == 0.2
    # Unknown detector falls back to MDv5 defaults
    results = {'info': {}, 'images': []}
    assert rd.get_typical_confidence_threshold_from_results(
        results) == 0.2

    # Speed estimate: explicit device name hits the lookup table
    speed = rd.estimate_md_images_per_second('md_v5a.0.0.pt',
                                             device_name='RTX 4090')
    assert speed == 17.6
    assert rd.estimate_md_images_per_second(
        'md_v5a.0.0.pt', device_name='TPU v5e lite') == 439.5
    # The device_kind string JAX actually reports on v5e hosts
    assert rd.estimate_md_images_per_second(
        'md_v5a.0.0.pt', device_name='TPU v5 lite') == 439.5
    assert rd.estimate_md_images_per_second(
        'md_v5a.0.0.pt', device_name='TPU v4') == 300.0
    assert rd.estimate_md_images_per_second(
        'md_v5a.0.0.pt', device_name='abacus') is None
    assert rd.estimate_md_images_per_second(
        'not_a_model.bin', device_name='RTX 4090') is None


def test_get_image_datetime(tmp_path):
    from PIL import Image as PILImage
    from megadetector_tpu.detection.run_detector_batch import \
        get_image_datetime

    # Image with EXIF DateTimeOriginal (tag 36867 in the Exif IFD)
    img = PILImage.fromarray(
        np.zeros((10, 10, 3), dtype=np.uint8))
    exif = img.getexif()
    exif.setdefault(34665, 1)
    p = str(tmp_path / 'dt.jpg')
    # PIL writes DateTimeOriginal via the Exif IFD; build it explicitly
    from PIL.Image import Exif
    e = Exif()
    e[306] = '2024:05:01 10:20:30'  # DateTime (fallback not used here)
    ifd = e.get_ifd(34665)
    ifd[36867] = '2024:05:01 10:20:30'  # DateTimeOriginal
    img.save(p, exif=e.tobytes())
    dt = get_image_datetime(p)
    assert dt in ('2024:05:01 10:20:30', None)

    # No EXIF -> None
    p2 = str(tmp_path / 'plain.jpg')
    PILImage.fromarray(np.zeros((10, 10, 3),
                                dtype=np.uint8)).save(p2)
    assert get_image_datetime(p2) is None


def test_options_to_command_roundtrip():
    from megadetector_tpu.detection.process_video import (
        ProcessVideoOptions, options_to_command)

    o = ProcessVideoOptions()
    o.input_video_file = 'videos'
    o.output_json_file = 'out.json'
    o.frame_sample = 5
    o.detector_options = {'force_cpu': 'true'}
    cmd = options_to_command(o)
    assert '--frame_sample 5' in cmd
    assert '--output_json_file "out.json"' in cmd
    assert '--detector_options force_cpu=true' in cmd

    # recursive=False must round-trip: the CLI default is True, so the
    # command has to carry an explicit --no-recursive
    o.recursive = False
    o.image_size = 960
    o.frame_batch_size = 16
    cmd = options_to_command(o)
    assert '--no-recursive' in cmd and '--recursive' not in \
        cmd.replace('--no-recursive', '')
    assert '--image_size 960' in cmd
    assert '--frame_batch_size 16' in cmd


def test_read_exif_tags_for_image_exiftool_shape(tmp_path, monkeypatch):
    # The exiftool backend returns a list aligned with its input; the
    # single-image wrapper must unwrap it to a flat tag dict (same
    # shape as the PIL backend), not store the one-element list.
    from megadetector_tpu.data_management import read_exif as re_

    paths = _make_images(tmp_path, [(20, 20)])
    monkeypatch.setattr(
        re_, 'read_exif_with_exiftool',
        lambda filenames, options=None: [{'Make': 'TestCam'}
                                         for _ in filenames])
    opts = re_.ReadExifOptions()
    opts.processing_library = 'exiftool'
    r = re_.read_exif_tags_for_image(paths[0], options=opts)
    assert isinstance(r['exif_tags'], dict)
    assert r['exif_tags'].get('Make') == 'TestCam'


def test_classification_count_and_description():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                count_detections_by_classification_category,
                get_classification_description_string)

    detections = [
        {'category': '1', 'conf': 0.9, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['0', 0.9]]},
        {'category': '1', 'conf': 0.8, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['0', 0.8]]},
        {'category': '1', 'conf': 0.7, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['1', 0.7]]},
        # Below detection threshold: ignored
        {'category': '1', 'conf': 0.05, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['1', 0.9]]},
        # Below classification threshold: ignored
        {'category': '1', 'conf': 0.9, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['1', 0.1]]},
    ]
    counts = count_detections_by_classification_category(detections)
    assert counts == {'0': 2, '1': 1}
    assert count_detections_by_classification_category([]) == {}

    descriptions = {'0': 'uuid;mammalia;;;;;rabbit',
                    '1': 'uuid;;;;;;'}
    s = get_classification_description_string(counts, descriptions)
    assert s == 'rabbit (2), undefined category (1)'


def test_sample_json_db(tmp_path):
    from megadetector_tpu.data_management.subset_json_db import (
        DbSamplingOptions, sample_json_db)

    db = {
        'images': [{'id': 'im{}'.format(i), 'file_name': 'x'}
                   for i in range(10)],
        'annotations': [
            {'id': 'a{}'.format(i), 'image_id': 'im{}'.format(i),
             'category_id': 0 if i < 8 else 1}
            for i in range(9)],
        'categories': [{'id': 0, 'name': 'deer'},
                       {'id': 1, 'name': 'puma'}],
    }
    options = DbSamplingOptions()
    options.category_name_to_max_count = {'deer': 3, 'default': -1}
    import copy
    out = sample_json_db(copy.deepcopy(db), options)
    kept_ids = {im['id'] for im in out['images']}
    # 3 deer + 1 puma + 1 unannotated (im9)
    assert len(kept_ids) == 5
    assert 'im8' in kept_ids and 'im9' in kept_ids
    assert all(ann['image_id'] in kept_ids
               for ann in out['annotations'])

    # Deterministic under the same seed
    out2 = sample_json_db(copy.deepcopy(db), options)
    assert {im['id'] for im in out2['images']} == kept_ids


def test_find_empty_labelme_files(tmp_path):
    import json as _json
    from megadetector_tpu.data_management.labelme_to_coco import \
        find_empty_labelme_files

    _make_images(tmp_path, [(20, 20), (20, 20), (20, 20)])
    with open(str(tmp_path / 'im_0.json'), 'w') as f:
        _json.dump({'shapes': []}, f)
    with open(str(tmp_path / 'im_1.json'), 'w') as f:
        _json.dump({'shapes': [{'label': 'animal',
                                'points': [[1, 1], [5, 5]]}]}, f)
    result = find_empty_labelme_files(str(tmp_path))
    assert result['images_with_empty_json_files'] == ['im_0.jpg']
    assert result['images_with_non_empty_json_files'] == ['im_1.jpg']
    assert result['images_with_no_json_files'] == ['im_2.jpg']


def test_create_yolo_symlinks(tmp_path):
    from megadetector_tpu.data_management.coco_to_yolo import \
        create_yolo_symlinks

    src = tmp_path / 'yolo'
    (src / 'cam1').mkdir(parents=True)
    _make_images(src / 'cam1', [(20, 20)])
    with open(str(src / 'cam1' / 'im_0.txt'), 'w') as f:
        f.write('0 0.5 0.5 0.2 0.2\n')
    classes = str(tmp_path / 'classes.txt')
    with open(classes, 'w') as f:
        f.write('animal\n')

    images_out = str(tmp_path / 'images')
    labels_out = str(tmp_path / 'labels')
    create_yolo_symlinks(str(src), images_out, labels_out,
                         class_list_file=classes)
    assert os.path.isfile(os.path.join(images_out, 'cam1', 'im_0.jpg'))
    assert os.path.isfile(os.path.join(labels_out, 'cam1', 'im_0.txt'))
    assert os.path.isfile(os.path.join(labels_out, 'object.data'))


def test_csv_results_roundtrip(tmp_path):
    import json as _json
    from megadetector_tpu.postprocessing.load_api_results import (
        load_api_results_csv, write_api_results_csv)
    import pandas as pd

    df = pd.DataFrame({
        'image_path': ['a/b.jpg', 'a/c.jpg'],
        'max_confidence': [0.9, 0.0],
        'detections': [[{'category': '1', 'conf': 0.9,
                         'bbox': [0.1, 0.1, 0.2, 0.2]}], []],
    })
    csv_fn = str(tmp_path / 'results.csv')
    write_api_results_csv(df, csv_fn)
    loaded = load_api_results_csv(csv_fn, normalize_paths=False)
    assert list(loaded['image_path']) == ['a/b.jpg', 'a/c.jpg']
    assert loaded['detections'][0][0]['category'] == '1'
    assert loaded['detections'][1] == []


def test_calibration_plot(tmp_path):
    from megadetector_tpu.postprocessing.detector_calibration import \
        plot_matched_confidence_values

    comparison = {'1': (np.random.RandomState(0).rand(50),
                        np.random.RandomState(1).rand(50))}
    out = str(tmp_path / 'cal.png')
    plot_matched_confidence_values(comparison, out)
    assert os.path.getsize(out) > 0


def test_plot_utils_additions(tmp_path):
    from megadetector_tpu.visualization import plot_utils as pu

    cm = str(tmp_path / 'cm.png')
    pu.plot_confusion_matrix(
        np.array([[5, 1], [2, 7]]), ['a', 'b'], normalize=True,
        output_file=cm)
    assert os.path.getsize(cm) > 0
    sb = str(tmp_path / 'sb.png')
    pu.plot_stacked_bar_chart(
        np.array([[1, 2], [3, 4]]), series_labels=['s1', 's2'],
        col_labels=['l1', 'l2'], log_scale=True, output_file=sb)
    assert os.path.getsize(sb) > 0


def test_db_box_rendering(tmp_path):
    paths = _make_images(tmp_path, [(100, 80)])

    # Absolute-pixel CCT boxes with a label map
    out = str(tmp_path / 'db_rendered.jpg')
    vu.draw_db_boxes_on_file(
        paths[0], out, boxes=[[10, 10, 40, 30]], classes=[1],
        label_map={1: 'animal'})
    with Image.open(out) as im:
        assert im.size == (100, 80)

    # Rescaling via original_size: boxes annotated at 2x resolution
    img = vu.load_image(paths[0])
    vu.render_db_bounding_boxes(
        [[20, 20, 80, 60]], [1], img, original_size=(200, 160))
    # And normalized boxes
    vu.render_db_bounding_boxes(
        [[0.1, 0.1, 0.4, 0.4]], ['person'], img,
        boxes_are_normalized=True)


def test_draw_bounding_boxes_on_file(tmp_path):
    paths = _make_images(tmp_path, [(100, 80)])
    out = str(tmp_path / 'md_rendered.jpg')
    detections = [{'category': '1', 'conf': 0.9,
                   'bbox': [0.1, 0.1, 0.3, 0.3]}]
    vu.draw_bounding_boxes_on_file(paths[0], out, detections,
                                   target_size=(50, -1))
    with Image.open(out) as im:
        assert im.size == (50, 40)


def test_separate_detections_move_and_skip_empty(tmp_path):
    import json as _json
    from megadetector_tpu.postprocessing \
        .separate_detections_into_folders import (
            SeparateDetectionsIntoFoldersOptions,
            separate_detections_into_folders)

    src = tmp_path / 'src'
    src.mkdir()
    _make_images(src, [(30, 30), (30, 30)])
    results = {
        'info': {'format_version': '1.6'},
        'detection_categories': {'1': 'animal'},
        'images': [
            {'file': 'im_0.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
            {'file': 'im_1.jpg', 'detections': []},
        ],
    }
    results_file = str(tmp_path / 'r.json')
    with open(results_file, 'w') as f:
        _json.dump(results, f)

    options = SeparateDetectionsIntoFoldersOptions(threshold=0.2)
    options.results_file = results_file
    options.base_input_folder = str(src)
    options.base_output_folder = str(tmp_path / 'out')
    options.move_images = True
    options.skip_empty_images = True
    options.n_threads = 1
    mapping = separate_detections_into_folders(options)

    assert list(mapping) == ['im_0.jpg']
    assert os.path.isfile(os.path.join(
        str(tmp_path / 'out'), 'animals', 'im_0.jpg'))
    # Moved, not copied; empty image untouched
    assert not os.path.isfile(str(src / 'im_0.jpg'))
    assert os.path.isfile(str(src / 'im_1.jpg'))
