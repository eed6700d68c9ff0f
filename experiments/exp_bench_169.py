"""
Second BENCH-format line: the 16:9 auto-canvas (720 -> 768x1280
stride-64 rectangle). The 4:3 canvas (960x1280) is the headline;
16:9 sources letterbox onto 20% fewer rows, so video-heavy
deployments see proportionally higher throughput. Run alone.
"""

import json
import os
import sys
import threading

threading.Timer(int(os.environ.get('EXP_WALL', '3300')),
                lambda: os._exit(3)).start()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

result = bench.bench(aspect=(9, 16))
print(json.dumps(result), flush=True)
os._exit(0)
