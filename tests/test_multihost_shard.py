"""
Multi-host (DCN) file-level shard flow, simulated: host i of N runs the
image sublist [i::N], writes its own JSON shard, and the shards combine
into a file identical to a single-host run — the faithful analog of the
reference's one-process-per-GPU chunk+merge flow
(megadetector/detection/run_detector_batch.py:20-34,
combine_batch_outputs.py:36; SURVEY §2.5). process_index/process_count
are monkeypatched since this box has one host.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('mh_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(folder / 'mh_test.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=17), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    return path


@pytest.fixture(scope='module')
def image_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp('mh_images')
    rng = np.random.RandomState(4)
    for i in range(6):
        h, w = rng.choice([48, 64, 80]), rng.choice([48, 64, 80])
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(folder / 'img_{:02d}.png'.format(i)))
    return str(folder)


def test_two_host_shard_flow_matches_single_host(checkpoint, image_folder,
                                                 tmp_path, monkeypatch):
    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch, write_results_to_file)
    from megadetector_tpu.parallel import mesh
    from megadetector_tpu.postprocessing.combine_batch_outputs import \
        combine_batch_output_files

    files = sorted(os.path.join(image_folder, f)
                   for f in os.listdir(image_folder))
    opts = {'use_mesh': 'false'}

    # --- Single-host reference run
    single = load_and_run_detector_batch(
        checkpoint, list(files), batch_size=4, quiet=True,
        detector_options=dict(opts))
    single_file = str(tmp_path / 'single.json')
    write_results_to_file(single, single_file,
                          relative_path_base=image_folder,
                          detector_file=checkpoint)

    # --- Simulated 2-host run: each "host" takes its stride shard and
    # writes its own output file
    shard_files = []
    n_hosts = 2
    for host in range(n_hosts):
        monkeypatch.setattr(mesh, 'process_index', lambda h=host: h)
        monkeypatch.setattr(mesh, 'process_count', lambda: n_hosts)
        shard = mesh.shard_image_list_for_hosts(list(files))
        assert shard == files[host::n_hosts]
        shard_out = mesh.shard_output_filename(
            str(tmp_path / 'multi.json'))
        assert 'host{:03d}'.format(host) in shard_out
        results = load_and_run_detector_batch(
            checkpoint, shard, batch_size=4, quiet=True,
            detector_options=dict(opts))
        write_results_to_file(results, shard_out,
                              relative_path_base=image_folder,
                              detector_file=checkpoint)
        shard_files.append(shard_out)

    # Shards are disjoint and complete
    shard_names = []
    for sf in shard_files:
        with open(sf) as f:
            shard_names.extend(im['file'] for im in json.load(f)['images'])
    assert sorted(shard_names) == \
        sorted(os.path.basename(f) for f in files)

    # --- Combine and compare to the single-host output
    combined_file = str(tmp_path / 'combined.json')
    combine_batch_output_files(shard_files, combined_file)

    with open(single_file) as f:
        single_data = json.load(f)
    with open(combined_file) as f:
        combined_data = json.load(f)

    # combine preserves shard concatenation order (like the reference's
    # combine_batch_outputs); compare order-independently by filename
    def by_file(data):
        return sorted(data['images'], key=lambda im: im['file'])

    assert by_file(combined_data) == by_file(single_data)
    assert combined_data['detection_categories'] == \
        single_data['detection_categories']
