"""
Synchronous (real-time) serving for MegaDetector-TPU.

The reference packaged MegaDetector behind a hosted "Synchronous API"
for real-time, latency-sensitive scenarios (reference:
megadetector/api/README.md:7-10; implementation archived upstream).
This package is the TPU-native equivalent: a self-hosted HTTP daemon
with dynamic micro-batching in front of a single compiled detector
program, plus a thin client.
"""

from megadetector_tpu.serving.server import MDServer, ServingOptions  # noqa: F401
