"""
Device-mesh utilities for data-parallel batch inference.

The reference achieves multi-accelerator throughput with one process per
GPU plus file-level shard merging (megadetector/detection/
run_detector_batch.py:20-34, combine_batch_outputs.py:36). The TPU-native
equivalent is a single process spanning all chips of a slice: the batch
axis of every inference step is sharded over a 1-D jax.sharding.Mesh, the
params are replicated, and XLA inserts any needed collectives over ICI.
Multi-host (DCN) jobs keep the reference's file-level sharding: each host
runs its own image chunk and writes its own JSON shard, merged by
postprocessing.combine_batch_outputs.
"""

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices=None, axis_name='data'):
    """
    A 1-D mesh over the first [n_devices] local devices (all by default).
    """

    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), \
            'Requested {} devices but only {} available'.format(
                n_devices, len(devices))
        devices = devices[:n_devices]
    return Mesh(np.array(devices, dtype=object).reshape(-1), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Sharding for [B, ...] arrays: batch over the mesh axis."""

    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    """Fully-replicated sharding (params, scalars)."""

    return NamedSharding(mesh, P())


def pad_batch_to_multiple(batch_arrays, multiple):
    """
    Pad the leading axis of each array in [batch_arrays] (a list/tuple of
    numpy arrays sharing batch size) to a multiple of [multiple] by
    repeating the last element. Returns (padded_arrays, original_size).
    """

    n = batch_arrays[0].shape[0]
    remainder = n % multiple
    if remainder == 0:
        return batch_arrays, n
    pad = multiple - remainder
    padded = []
    for a in batch_arrays:
        pad_block = np.repeat(a[-1:], pad, axis=0)
        padded.append(np.concatenate([a, pad_block], axis=0))
    return padded, n


def local_device_count():
    return jax.local_device_count()


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def shard_image_list_for_hosts(image_file_names):
    """
    Multi-host data sharding at the file level (the faithful analog of the
    reference's per-GPU chunking): host i of N takes images [i::N].
    """

    return image_file_names[process_index()::max(process_count(), 1)]


def shard_output_filename(output_file, index=None):
    """
    Per-host output shard path for a multi-host run:
    results.json -> results.host003.json. Shards are merged by
    postprocessing.combine_batch_outputs.combine_batch_output_files,
    mirroring the reference's per-GPU shard+combine flow
    (run_detector_batch.py:20-34, combine_batch_outputs.py:36).
    """

    import os
    i = process_index() if index is None else index
    base, ext = os.path.splitext(output_file)
    return '{}.host{:03d}{}'.format(base, i, ext)
