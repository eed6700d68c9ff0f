"""
Direct coverage for the handful of modules not exercised elsewhere:
annotation constants, speciesnet_to_md CLI, md_to_coco / md_to_labelme
converters, url_utils (file:// transport), compile_cache.
"""

import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

from megadetector_tpu.postprocessing.md_to_coco import md_to_coco
from megadetector_tpu.postprocessing.md_to_labelme import md_to_labelme
from megadetector_tpu.utils import url_utils


def _write_md_results(path, files_and_sizes):
    images = []
    for name, (w, h) in files_and_sizes.items():
        images.append({
            'file': name,
            'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.2, 0.3, 0.4]},
                {'category': '2', 'conf': 0.04,
                 'bbox': [0.5, 0.5, 0.2, 0.2]},
            ],
        })
    out = {
        'info': {'format_version': '1.6', 'detector': 'test'},
        'detection_categories': {'1': 'animal', '2': 'person',
                                 '3': 'vehicle'},
        'images': images,
    }
    with open(path, 'w') as f:
        json.dump(out, f)
    return out


def _make_images(folder, files_and_sizes):
    rng = np.random.RandomState(0)
    for name, (w, h) in files_and_sizes.items():
        p = os.path.join(folder, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)


def test_annotation_constants():
    from megadetector_tpu.data_management import annotation_constants as ac
    assert ac.detector_bbox_category_id_to_name[1] == 'animal'
    assert ac.detector_bbox_category_name_to_id['vehicle'] == 3
    assert ac.NUM_DETECTOR_CATEGORIES == 3


def test_md_to_coco(tmp_path):
    files = {'a/x.jpg': (320, 240), 'y.jpg': (160, 120)}
    folder = str(tmp_path / 'images')
    _make_images(folder, files)
    md_file = str(tmp_path / 'md.json')
    _write_md_results(md_file, files)

    coco_file = str(tmp_path / 'coco.json')
    md_to_coco(md_file, coco_output_file=coco_file, image_folder=folder,
               confidence_threshold=0.1)
    with open(coco_file) as f:
        coco = json.load(f)
    assert len(coco['images']) == 2
    # Only the 0.9 detection survives the 0.1 threshold
    assert len(coco['annotations']) == 2
    im = [i for i in coco['images'] if i['file_name'] == 'a/x.jpg'][0]
    assert im['width'] == 320 and im['height'] == 240
    ann = [a for a in coco['annotations']
           if a['image_id'] == im['id']][0]
    # normalized (0.1, 0.2, 0.3, 0.4) -> pixels
    assert abs(ann['bbox'][0] - 0.1 * 320) < 1e-6
    assert abs(ann['bbox'][3] - 0.4 * 240) < 1e-6


def test_md_to_labelme(tmp_path):
    files = {'z.jpg': (200, 100)}
    folder = str(tmp_path / 'images')
    _make_images(folder, files)
    md_file = str(tmp_path / 'md.json')
    _write_md_results(md_file, files)

    md_to_labelme(md_file, folder, confidence_threshold=0.1,
                  overwrite=True)
    labelme_file = os.path.join(folder, 'z.json')
    assert os.path.isfile(labelme_file)
    with open(labelme_file) as f:
        lm = json.load(f)
    assert lm['imageWidth'] == 200 and lm['imageHeight'] == 100
    assert len(lm['shapes']) == 1
    shape = lm['shapes'][0]
    assert shape['label'] == 'animal'
    (x0, y0), (x1, y1) = shape['points']
    assert abs(x0 - 0.1 * 200) < 1e-6
    assert abs(y1 - (0.2 + 0.4) * 100) < 1e-6


def test_speciesnet_to_md_cli(tmp_path):
    predictions = {
        'predictions': [{
            'filepath': 'base/cam/img1.jpg',
            'detections': [{'category': '1', 'label': 'animal',
                            'conf': 0.8,
                            'bbox': [0.1, 0.1, 0.4, 0.4]}],
            'prediction':
                ';'.join(['uuid', 'mammalia', 'carnivora', 'felidae',
                          'puma', 'concolor', 'cougar']),
            'prediction_score': 0.7,
        }],
    }
    pred_file = str(tmp_path / 'predictions.json')
    with open(pred_file, 'w') as f:
        json.dump(predictions, f)
    out_file = str(tmp_path / 'md.json')

    result = subprocess.run(
        [sys.executable, '-m',
         'megadetector_tpu.data_management.speciesnet_to_md',
         pred_file, out_file, '--base_folder', 'base/'],
        capture_output=True, text=True, timeout=240)
    assert result.returncode == 0, result.stderr[-500:]
    with open(out_file) as f:
        md = json.load(f)
    assert md['images'][0]['file'] == 'cam/img1.jpg'
    assert len(md['images'][0]['detections']) == 1


def test_url_utils_file_transport(tmp_path):
    src = tmp_path / 'payload.bin'
    src.write_bytes(b'hello megadetector')
    url = 'file://' + str(src)

    dest = str(tmp_path / 'out' / 'payload.bin')
    got = url_utils.download_url(url, dest, verbose=False)
    assert got == dest
    assert open(dest, 'rb').read() == b'hello megadetector'

    # Cached: force_download=False must not re-fetch (mtime unchanged)
    mtime = os.path.getmtime(dest)
    url_utils.download_url(url, dest, verbose=False)
    assert os.path.getmtime(dest) == mtime


def test_compile_cache(tmp_path, monkeypatch):
    from megadetector_tpu.utils import compile_cache

    monkeypatch.setenv('MD_COMPILATION_CACHE', '0')
    assert compile_cache.enable_persistent_cache() is None

    monkeypatch.delenv('MD_COMPILATION_CACHE', raising=False)
    d = str(tmp_path / 'cc')
    assert compile_cache.enable_persistent_cache(d) == d
    assert os.path.isdir(d)


def test_url_utils_http_transport(tmp_path):
    """Hermetic HTTP download via a local http.server, the reference's
    pattern for testing the download path without egress
    (reference utils/url_utils.py:473)."""

    import http.server
    import socketserver
    import threading

    serve_dir = tmp_path / 'serve'
    serve_dir.mkdir()
    (serve_dir / 'blob.bin').write_bytes(b'x' * 4096)

    handler = type('H', (http.server.SimpleHTTPRequestHandler,), {
        'directory': str(serve_dir),
        'log_message': lambda self, *a: None,
    })

    def make_handler(*args, **kwargs):
        return handler(*args, directory=str(serve_dir), **kwargs)

    with socketserver.TCPServer(('127.0.0.1', 0), make_handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = 'http://127.0.0.1:{}/blob.bin'.format(port)
            dest = str(tmp_path / 'dl' / 'blob.bin')
            got = url_utils.download_url(url, dest, verbose=False)
            assert got == dest
            assert os.path.getsize(dest) == 4096

            # parallel downloads: distinct URLs so the pool actually
            # exercises the map
            mapping = {
                'http://127.0.0.1:{}/blob.bin?copy={}'.format(port, i):
                    str(tmp_path / 'dl2' / 'b{}.bin'.format(i))
                for i in range(3)}
            results = url_utils.parallel_download_urls(mapping,
                                                       verbose=False)
            for target in mapping.values():
                assert os.path.getsize(target) == 4096
            assert results is not None
        finally:
            srv.shutdown()


def test_md_to_coco_validate_image_sizes(tmp_path, capsys):
    """validate_image_sizes must check stored sizes against the files
    and prefer the file's size on mismatch (review-batch-4 finding 9)."""

    files = {'a/x.jpg': (320, 240)}
    folder = str(tmp_path / 'images')
    _make_images(folder, files)
    md_file = str(tmp_path / 'md.json')
    md = _write_md_results(md_file, files)
    # Corrupt the stored size
    md['images'][0]['width'] = 999
    md['images'][0]['height'] = 111
    with open(md_file, 'w') as f:
        json.dump(md, f)

    coco = md_to_coco(md_file, image_folder=folder,
                      validate_image_sizes=True)
    im = coco['images'][0]
    assert im['width'] == 320 and im['height'] == 240
    assert 'size mismatch' in capsys.readouterr().out

    # Without validation, the stored size is trusted
    coco = md_to_coco(md_file, image_folder=folder)
    assert coco['images'][0]['width'] == 999


def test_remap_detection_categories_overwrite(tmp_path):
    from megadetector_tpu.postprocessing.remap_detection_categories import (
        remap_detection_categories)

    files = {'a/x.jpg': (320, 240)}
    md_file = str(tmp_path / 'md.json')
    _write_md_results(md_file, files)
    out_file = str(tmp_path / 'out.json')
    target_map = {'1': 'animal', '2': 'person', '3': 'vehicle'}
    remap_detection_categories(md_file, out_file, target_map)
    import pytest
    with pytest.raises(AssertionError):
        remap_detection_categories(md_file, out_file, target_map,
                                   overwrite=False)
