"""
Hardware validation of the AOT detector artifact (.mdpkg) on the real
TPU: export a small detector, run the deserialized StableHLO program on
the chip, and compare detections against the live TPUDetector.

Safety: all device work happens in a self-exiting watchdog child (the
remote relay wedges if a process dies mid-op; see bench.py). The parent
never touches the TPU.

Result (2026-08-18, v5e single chip via relay):
  exported artifact (platforms cpu+tpu, yolov5n@320 b2) deserialized
  and EXECUTED on the TPU; detections match the live detector exactly
  (same 512-capacity program); one fresh XLA compile from the
  deserialized StableHLO, no relay incidents.
"""

import os
import subprocess
import sys

CHILD = r'''
import os, threading
threading.Timer(540, lambda: os._exit(3)).start()

import numpy as np
import jax

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.detection.export_detector import (
    export_detector, ExportedDetector)
from megadetector_tpu.models.detector import TPUDetector
from megadetector_tpu.utils.md_tests import compare_detection_lists

print('backend:', jax.default_backend(), jax.devices())

ckpt = '/tmp/exp_export_tpu/md_n320.npz'
os.makedirs('/tmp/exp_export_tpu', exist_ok=True)
cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
params = yolov5.init_params(cfg, seed=11)
save_checkpoint(params, ckpt, {
    'metadata_format_version': 1.0,
    'model_version_string': 'v5a.0.1-exp',
    'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
    'class_names': ['animal', 'person', 'vehicle'],
    'image_size': 320, 'strides': [8, 16, 32],
    'anchors': cfg.anchors.tolist()})

artifact = '/tmp/exp_export_tpu/md_n320.mdpkg'
export_detector(ckpt, artifact, batch_sizes=[2], aspects=[],
                platforms=['cpu', 'tpu'], verbose=True)

rng = np.random.RandomState(3)
images = [rng.randint(0, 255, (300, 300, 3), dtype=np.uint8)
          for _ in range(2)]
ids = ['a.jpg', 'b.jpg']

exported = ExportedDetector(artifact)
res_aot = exported.generate_detections_one_batch(
    images, ids, detection_threshold=0.005)
print('AOT on', jax.default_backend(), ':',
      [len(r['detections']) for r in res_aot])

live = TPUDetector(ckpt, detector_options={'auto_escalate_topk': False})
res_live = live.generate_detections_one_batch(
    images, ids, detection_threshold=0.005)

for a, b in zip(res_live, res_aot):
    r = compare_detection_lists(a['detections'], b['detections'],
                                image_id=a['file'])
    assert not r['errors'], r['errors'][:5]
print('MATCH: AOT artifact == live detector on TPU')
os._exit(0)
'''


def main():
    probe = (
        'import os, threading;'
        'threading.Timer(240, lambda: os._exit(3)).start();'
        'import jax, numpy as np;'
        'x = jax.device_put(np.ones((128,128), np.float32));'
        'y = jax.jit(lambda a: (a @ a).sum())(x);'
        'print(float(np.asarray(jax.device_get(y))));'
        'os._exit(0)')
    out = subprocess.run([sys.executable, '-c', probe],
                         capture_output=True, timeout=300)
    if out.returncode != 0:
        print('accelerator probe failed (rc {}); not running'.format(
            out.returncode), file=sys.stderr)
        sys.exit(2)
    print('accelerator healthy; running AOT validation child')
    out = subprocess.run([sys.executable, '-c', CHILD], timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    sys.exit(out.returncode)


if __name__ == '__main__':
    main()
