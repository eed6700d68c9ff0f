"""
Tests for the synchronous serving daemon (serving/server.py) and client:
dynamic micro-batching, MD-format responses, failure containment,
backpressure, metrics, and the client folder round trip.
"""

import io
import json
import threading

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.serving import MDServer, ServingOptions
from megadetector_tpu.serving import client as md_client


def _jpeg_bytes(seed=0, size=(72, 56)):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG')
    return buf.getvalue()


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('serving_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=11)
    path = str(folder / 'md_serving_test.npz')
    save_checkpoint(params, path, {
        'metadata_format_version': 1.0,
        'model_version_string': 'v5a.0.1-serving-test',
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64,
        'strides': [8, 16, 32],
        'anchors': cfg.anchors.tolist(),
    })
    return path


@pytest.fixture(scope='module')
def server(checkpoint):
    options = ServingOptions()
    options.port = 0
    options.max_batch_size = 4
    options.batch_wait_ms = 5.0
    options.force_cpu = True
    server = MDServer(checkpoint, options)
    server.start()
    yield server
    server.shutdown()


@pytest.fixture(scope='module')
def url(server):
    return 'http://127.0.0.1:{}'.format(server.port)


def test_health_and_model_info(url):
    health = md_client.server_health(url)
    assert health['status'] == 'ok'
    assert health['model_version'] == 'v5a.0.1-serving-test'
    info = md_client._get_json(url, '/v1/model')
    assert info['detection_categories'] == \
        {'1': 'animal', '2': 'person', '3': 'vehicle'}
    assert info['image_size'] == 64


def test_single_detect(url):
    record = md_client.detect_image_bytes(
        url, _jpeg_bytes(seed=1), image_id='cam1/img1.jpg')
    assert record['file'] == 'cam1/img1.jpg'
    assert isinstance(record['detections'], list)
    for det in record['detections']:
        assert set(det) >= {'category', 'conf', 'bbox'}
        assert det['conf'] >= 0.005
        assert len(det['bbox']) == 4


def test_corrupt_image_failure_record(url):
    record = md_client.detect_image_bytes(
        url, b'not actually a jpeg', image_id='broken.jpg')
    assert record['detections'] is None
    assert record['failure'] == 'image access failure'


def test_batch_endpoint_and_order(url):
    pairs = [('a.jpg', _jpeg_bytes(seed=2)),
             ('b.jpg', b'garbage'),
             ('c.jpg', _jpeg_bytes(seed=3))]
    envelope = md_client.detect_images(url, pairs)
    files = [r['file'] for r in envelope['images']]
    assert files == ['a.jpg', 'b.jpg', 'c.jpg']
    assert envelope['images'][1]['failure'] == 'image access failure'
    assert envelope['images'][0]['detections'] is not None
    assert envelope['detection_categories']['1'] == 'animal'


def test_threshold_filtering(url):
    raw = _jpeg_bytes(seed=4)
    low = md_client.detect_image_bytes(url, raw, detection_threshold=0.005)
    high = md_client.detect_image_bytes(url, raw, detection_threshold=1.0)
    assert high['detections'] == []
    assert high['max_detection_conf'] == 0.0
    assert len(low['detections']) >= len(high['detections'])


def test_concurrent_requests_batch_together(url, server):
    """Many parallel requests should coalesce into shared device batches."""

    batches_before = server.metrics.snapshot()['batches_total']
    n_requests = 8
    results = [None] * n_requests
    errors = []

    def _worker(i):
        try:
            results[i] = md_client.detect_image_bytes(
                url, _jpeg_bytes(seed=10 + i),
                image_id='thread_{}.jpg'.format(i))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=_worker, args=(i,))
               for i in range(n_requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r is not None and r['detections'] is not None
               for r in results)
    snapshot = server.metrics.snapshot()
    new_batches = snapshot['batches_total'] - batches_before
    # 8 images in <8 batches proves at least one shared batch
    assert 1 <= new_batches < n_requests


def test_metrics_counters(url, server):
    md_client.detect_image_bytes(url, _jpeg_bytes(seed=20))
    snapshot = md_client.server_metrics(url)
    assert snapshot['images_total'] >= 1
    assert snapshot['failures_total'] >= 1  # from the corrupt-image test
    assert snapshot['latency_p50_s'] is not None
    assert snapshot['images_per_second'] > 0


def test_unknown_path_404(url):
    with pytest.raises(RuntimeError, match='404'):
        md_client._post_json(url, '/v1/nope', {})


def test_bad_threshold_400(url):
    with pytest.raises(RuntimeError, match='400'):
        md_client._post_json(url, '/v1/detect_batch', {
            'images': [{'id': 'x', 'data': ''}],
            'detection_threshold': 'high'})


def test_client_folder_round_trip(url, tmp_path):
    folder = tmp_path / 'images'
    folder.mkdir()
    for i in range(3):
        (folder / 'img_{}.jpg'.format(i)).write_bytes(
            _jpeg_bytes(seed=30 + i))
    (folder / 'bad.jpg').write_bytes(b'junk')
    output_file = str(tmp_path / 'results.json')

    results = md_client.detect_folder(
        url, image_folder=str(folder), output_file=output_file,
        chunk_size=2, quiet=True)
    assert len(results['images']) == 4

    with open(output_file) as f:
        written = json.load(f)
    assert written['info']['format_version']
    files = [r['file'] for r in written['images']]
    assert files == sorted(files)
    failed = [r for r in written['images'] if r['detections'] is None]
    assert len(failed) == 1 and failed[0]['failure']

    # The standard validator accepts the client-written file
    from megadetector_tpu.postprocessing.validate_batch_results import \
        validate_batch_results
    validation = validate_batch_results(output_file)
    assert validation['validation_results']['validation_errors'] == []
