"""
Tests for workflows/compare_inference_options: grid assembly, job
execution + timing, preview galleries, per-image review pages,
agreement stats, and skip-finished semantics.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.workflows.compare_inference_options import (
    InferenceComparisonOptions,
    assemble_comparison_jobs,
    compare_inference_options,
    parameters_to_name,
)


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('cmp_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=3)
    path = str(folder / 'md_cmp.npz')
    save_checkpoint(params, path, {
        'metadata_format_version': 1.0,
        'model_version_string': 'v5a.0.1',
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
def image_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp('cmp_images')
    rng = np.random.RandomState(5)
    for i, (w, h) in enumerate([(80, 60), (64, 64)]):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(folder / 'img_{}.jpg'.format(i)))
    sub = folder / 'cam1'
    sub.mkdir()
    Image.fromarray(rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)) \
        .save(str(sub / 'img_sub.jpg'))
    return str(folder)


def test_parameters_to_name_stable():
    name = parameters_to_name(
        {'model_name': 'MDV5A', 'aug': 'noaug', 'image_size': None})
    # Sorted keys: aug, image_size, model_name
    assert name == 'noaug_none_mdv5a'


def test_assemble_jobs_grid(tmp_path):
    options = InferenceComparisonOptions()
    options.output_folder = str(tmp_path)
    options.model_files = ['a.npz', 'b.npz']
    options.compatibility_modes = ['modern', 'classic']
    options.image_sizes = [None, 128]
    options.augment_states = [False, True]
    jobs = assemble_comparison_jobs(options)
    assert len(jobs) == 2 * 2 * 2 * 2
    names = [j['job_name'] for j in jobs]
    assert len(set(names)) == len(names)
    for job in jobs:
        assert job['job_output_file'].endswith(job['job_name'] + '.json')


def test_assemble_jobs_duplicate_basenames(tmp_path):
    # Two model files with the same basename (the typical A/B-checkpoint
    # comparison) must not collide on job_name / job_output_file.
    options = InferenceComparisonOptions()
    options.output_folder = str(tmp_path)
    options.model_files = ['runA/best.npz', 'runB/best.npz']
    jobs = assemble_comparison_jobs(options)
    assert len(jobs) == 2
    names = [j['job_name'] for j in jobs]
    outputs = [j['job_output_file'] for j in jobs]
    assert len(set(names)) == 2
    assert len(set(outputs)) == 2
    # Distinct basenames keep their plain tags
    options.model_files = ['runA/a.npz', 'runB/b.npz']
    jobs = assemble_comparison_jobs(options)
    assert any('a_' in j['job_name'] or j['params']['model_name'] == 'a'
               for j in jobs)
    assert all('-m' not in j['params']['model_name'] for j in jobs)


def test_compare_inference_options_end_to_end(tiny_checkpoint,
                                              image_folder, tmp_path):
    options = InferenceComparisonOptions()
    options.input_folder = image_folder
    options.output_folder = str(tmp_path / 'cmp_out')
    options.model_files = [tiny_checkpoint]
    options.canvas_modes = ['auto', 'square']
    options.batch_size = 2
    options.visualization_sample = -1
    options.rendering_threshold = 0.0

    summary = compare_inference_options(options)

    assert len(summary['jobs']) == 2
    for job in summary['jobs']:
        assert os.path.isfile(job['job_output_file'])
        assert job['skipped'] is False
        assert job['elapsed'] > 0
        assert job['images_per_second'] > 0
        with open(job['job_output_file']) as f:
            data = json.load(f)
        assert len(data['images']) == 3
        # Preview gallery
        assert os.path.isfile(job['html_output_file'])

    # Per-image review pages: master index + one page per image with
    # both jobs' renderings
    review = os.path.join(options.output_folder, 'image_review')
    master = os.path.join(review, 'index.html')
    assert os.path.isfile(master)
    with open(master) as f:
        master_html = f.read()
    assert 'img_0.jpg' in master_html and 'cam1/img_sub.jpg' in master_html
    page_dirs = [d for d in os.listdir(review)
                 if os.path.isdir(os.path.join(review, d))]
    assert len(page_dirs) == 3
    one_page = os.path.join(review, page_dirs[0])
    copied = [fn for fn in os.listdir(one_page) if fn.endswith('.jpg')]
    assert len(copied) == 2  # one rendering per job

    # Agreement stats for the single pair
    assert len(summary['pairwise_agreement']) == 1
    pair = summary['pairwise_agreement'][0]
    assert sum(pair['category_counts'].values()) >= 1

    # Re-run skips finished jobs
    summary2 = compare_inference_options(options)
    assert all(j['skipped'] for j in summary2['jobs'])


def test_batch_driver_augment_plumbs(tiny_checkpoint, image_folder):
    from megadetector_tpu.detection.run_detector_batch import \
        load_and_run_detector_batch
    files = [os.path.join(image_folder, 'img_0.jpg')]
    results = load_and_run_detector_batch(
        tiny_checkpoint, files, quiet=True, batch_size=1, augment=True,
        detector_options={'force_cpu': 'true'})
    assert len(results) == 1
    assert results[0]['detections'] is not None
