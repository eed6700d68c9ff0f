"""
megadetector_tpu: a TPU-native (JAX/XLA/Pallas) camera-trap animal-detection
framework with the capabilities of the MegaDetector toolkit.

Compute path: flax/JAX models compiled by XLA, fused Pallas preprocessing,
on-device fixed-shape NMS, pjit/shard_map batch sharding over TPU meshes.
Host path: folder enumeration, checkpointing, the MD results JSON contract,
and the postprocessing ecosystem.

Public API mirrors the `megadetector` pip package where the concepts overlap
(reference: /root/reference/megadetector, e.g. detection/run_detector.py,
detection/run_detector_batch.py), but the implementation is TPU-first and
shares no code with the reference.
"""

__version__ = '0.1.0'
