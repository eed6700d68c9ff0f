"""
Serving daemon on the real chip: MDServer (dynamic micro-batching HTTP
server) with an int8-chain yolov5l6 checkpoint at image_size 640,
driven by concurrent stdlib clients posting JPEGs; reports /metrics
(p50/p95 latency, throughput) and a wall-clock e2e rate.

Honest caveats baked into the numbers: this measurement host has ONE
CPU core — host-side JPEG decode and HTTP serialize share it with the
client threads, so the e2e rate is a HOST-bound floor, not the device
ceiling (the device-side ceiling is bench.py's 464.5 img/s at 1280px /
proportionally higher at 640px).

In-process server (context manager) so shutdown is clean — the TPU
relay must never see a killed process mid-op.

Run alone; self-exits via watchdog.
"""

import io
import os
import sys
import threading
import time

threading.Timer(1500, lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIENTS = int(os.environ.get('EXP_CLIENTS', '8'))
N_PER_CLIENT = int(os.environ.get('EXP_PER_CLIENT', '24'))
BATCH_WAIT_MS = float(os.environ.get('EXP_WAIT_MS', '10'))
MAX_BATCH = int(os.environ.get('EXP_MAX_BATCH', '32'))


def main():
    from PIL import Image

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint)
    from megadetector_tpu.serving.server import MDServer, ServingOptions
    from megadetector_tpu.serving import client as cl

    # int8-chain flagship at a serving-sized canvas
    folder = '/tmp/exp_serving_model'
    os.makedirs(folder, exist_ok=True)
    f_path = os.path.join(folder, 'float.npz')
    q_path = os.path.join(folder, 'int8.npz')
    if not os.path.isfile(q_path):
        cfg = yolov5.YoloV5Config('yolov5l6', num_classes=3)
        save_checkpoint(yolov5.init_params(cfg, seed=0), f_path, {
            'arch': 'yolov5l6', 'model_type': 'yolov5', 'num_classes': 3,
            'class_names': ['animal', 'person', 'vehicle'],
            'image_size': 640, 'anchors': cfg.anchors.tolist()})
        quantize_checkpoint(f_path, q_path, calibration_image_size=640,
                            mode='chain')

    # 4:3 test JPEGs (640x480 -> the 480x640 auto rect canvas)
    rng = np.random.RandomState(0)
    jpegs = []
    for i in range(8):
        arr = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format='JPEG', quality=85)
        jpegs.append(buf.getvalue())
    print('prepared {} jpegs, ~{:.0f} KB each'.format(
        len(jpegs), np.mean([len(b) for b in jpegs]) / 1024), flush=True)

    options = ServingOptions()
    options.max_batch_size = MAX_BATCH
    options.batch_wait_ms = BATCH_WAIT_MS
    options.port = 18123
    options.verbose = False
    # Random-weight models put ~20k candidates above the 0.005 floor
    # (every scene maximally 'crowded'), driving candidate-capacity
    # escalation to 8192 and unrepresentative NMS cost; serve at a
    # realistic operating threshold instead.
    options.detection_threshold = float(
        os.environ.get('EXP_THRESHOLD', '0.35'))

    with MDServer(q_path, options) as server:  # noqa: F841
        url = 'http://127.0.0.1:18123'
        print('health:', cl.server_health(url), flush=True)

        # warmup: compile the padded batch program
        t0 = time.time()
        cl.detect_image_bytes(url, jpegs[0], image_id='warmup.jpg')
        print('warmup (compile) took {:.1f}s'.format(time.time() - t0),
              flush=True)

        results = []
        errors = []

        def client_worker(k):
            for i in range(N_PER_CLIENT):
                try:
                    r = cl.detect_image_bytes(
                        url, jpegs[(k + i) % len(jpegs)],
                        image_id='c{}_{}.jpg'.format(k, i))
                    results.append(r)
                except Exception as e:  # noqa: BLE001
                    errors.append(repr(e))

        threads = [threading.Thread(target=client_worker, args=(k,))
                   for k in range(N_CLIENTS)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0

        n = len(results)
        print('e2e: {} images in {:.2f}s = {:.1f} img/s '
              '({} errors)'.format(n, wall, n / wall, len(errors)),
              flush=True)
        if errors:
            print('first error:', errors[0], flush=True)
        m = cl.server_metrics(url)
        for k in sorted(m):
            print('  metric {}: {}'.format(k, m[k]), flush=True)
        ok = sum(1 for r in results
                 if r.get('detections') is not None)
        print('responses with detections: {}/{}'.format(ok, n),
              flush=True)


main()
os._exit(0)
