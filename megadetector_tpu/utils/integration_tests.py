"""
Self-contained integration test harness (the reference's md_tests layer).

Behavioral contract follows megadetector/utils/md_tests.py:1699
(run_tests): exercise the real pipelines end-to-end — single image,
folder batch (multiple batch sizes, compared for consistency), augmented
inference, video, tiled inference, postprocessing, RDE — and compare
outputs with the IoU-matched tolerance comparator. The reference
downloads a golden test package; this harness is hermetic: it generates a
synthetic test package (images, videos, a random-weight converted
checkpoint) so it runs in air-gapped CI, and uses run-vs-run consistency
(batch-size invariance, single-vs-batch equality) as the correctness
oracle. Point [options.model_file] at a real converted checkpoint and
[options.expected_results_file] at a golden file for true golden testing.
"""

import json
import os
import shutil
import tempfile

import numpy as np


class MDTestOptions:
    """Options controlling run_tests()."""

    def __init__(self):
        # Use this model instead of the synthetic one (a converted .npz)
        self.model_file = None
        # Golden results to compare the folder run against (optional)
        self.expected_results_file = None
        self.max_conf_error = 0.005
        self.max_coord_error = 0.001
        self.iou_match_threshold = 0.85
        self.scratch_dir = None
        self.canvas_size = 96
        self.cli_working_dir = None
        self.skip_video_tests = False
        self.skip_tiled_tests = False
        # CLI tier: drive the module CLIs as subprocesses and require
        # byte-identical detections vs the Python-API run (the
        # reference's run_cli_tests, md_tests.py:1116). Slow on a
        # 1-core box (each subprocess pays the jax import).
        self.skip_cli_tests = True
        self.force_cpu = True
        self.verbose = True


def _build_test_package(options):
    """Synthetic test package: images, videos, and a tiny checkpoint."""

    from PIL import Image
    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint

    scratch = options.scratch_dir or tempfile.mkdtemp(
        prefix='md_tpu_tests_')
    os.makedirs(scratch, exist_ok=True)
    image_dir = os.path.join(scratch, 'images')
    rng = np.random.RandomState(0)

    for i, (w, h) in enumerate([(160, 120), (120, 160), (96, 96),
                                (200, 80)]):
        p = os.path.join(image_dir, 'cam{}'.format(i % 2),
                         'img_{:02d}.jpg'.format(i))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (h, w, 3),
                                    dtype=np.uint8)).save(p)
    with open(os.path.join(image_dir, 'corrupt.jpg'), 'wb') as f:
        f.write(b'not a jpeg')

    video_dir = os.path.join(scratch, 'videos')
    os.makedirs(video_dir, exist_ok=True)
    try:
        import cv2
        out = cv2.VideoWriter(
            os.path.join(video_dir, 'v.mp4'),
            cv2.VideoWriter_fourcc(*'mp4v'), 5.0, (96, 64))
        for _ in range(10):
            out.write(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8))
        out.release()
    except Exception:
        options.skip_video_tests = True

    model_file = options.model_file
    if model_file is None:
        cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
        params = yolov5.init_params(cfg, seed=7)
        model_file = os.path.join(scratch, 'md_test.npz')
        save_checkpoint(params, model_file, {
            'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
            'model_type': 'yolov5', 'num_classes': 3,
            'class_names': ['animal', 'person', 'vehicle'],
            'image_size': options.canvas_size,
            'anchors': cfg.anchors.tolist()})

    return scratch, image_dir, video_dir, model_file


#: The reference's hosted test package; downloads activate when egress
#: exists (reference: md_tests.py:83)
TEST_DATA_URL = 'https://lila.science/public/md-test-package.zip'


def download_test_data(options=None):
    """
    Stage the test-data package into options.scratch_dir (reference:
    md_tests.py:221-316): download + unzip TEST_DATA_URL when the
    hosted package is reachable, else fall back to the hermetic
    synthetic package builder (the zero-egress default in this
    framework). Returns (scratch, image_dir, video_dir, model_file).
    """

    import zipfile

    if options is None:
        options = MDTestOptions()

    test_data_url = getattr(options, 'test_data_url', TEST_DATA_URL)
    if options.scratch_dir is not None:
        zip_path = os.path.join(options.scratch_dir,
                                test_data_url.split('/')[-1])
        try:
            if not os.path.isfile(zip_path):
                from megadetector_tpu.utils.url_utils import \
                    download_url
                download_url(test_data_url, zip_path)
            with zipfile.ZipFile(zip_path) as zf:
                zf.extractall(options.scratch_dir)
            print('Staged test package from {}'.format(test_data_url))

            # Use the hosted package's own folders: any extracted
            # directory containing images/videos becomes the test set
            from megadetector_tpu.utils.path_utils import find_images
            scratch = options.scratch_dir
            image_dir = None
            video_dir = None
            for entry in sorted(os.listdir(scratch)):
                p = os.path.join(scratch, entry)
                if not os.path.isdir(p):
                    continue
                if image_dir is None and len(find_images(
                        p, recursive=True)) > 0:
                    image_dir = p
                if video_dir is None and any(
                        f.lower().endswith(('.mp4', '.avi', '.mov'))
                        for _, _, files in os.walk(p) for f in files):
                    video_dir = p
            if image_dir is not None:
                model_file = options.model_file
                if model_file is None:
                    # The hosted package carries expected-results files
                    # but no model; the registry supplies it
                    from megadetector_tpu.models.registry import \
                        try_download_known_detector
                    model_file = try_download_known_detector('MDV5A')
                if video_dir is None:
                    options.skip_video_tests = True
                return scratch, image_dir, video_dir, model_file
            print('Extracted package contains no images; building the '
                  'synthetic package')
        except Exception as e:
            print('Hosted test package unavailable ({}); building the '
                  'synthetic package'.format(e))

    return _build_test_package(options)


def get_expected_results_filename(gpu_is_available,
                                  model_string='mdv5a',
                                  test_type='image', augment=False,
                                  options=None):
    """
    Expected-results filename for the current inference environment
    (reference: md_tests.py:155-219 — there keyed by GPU availability
    and torch major version; here by accelerator backend and jax
    major.minor, since XLA toolchain revs are what move results on this
    stack).
    """

    hw_string = 'tpu' if gpu_is_available else 'cpu'
    import jax
    jax_version = '.'.join(jax.__version__.split('.')[:2])
    backend_string = 'jax{}'.format(jax_version)

    aug_string = 'augment-' if augment else ''
    if test_type == 'image':
        fn = '{}-{}{}-{}-{}.json'.format(model_string, aug_string,
                                         test_type, hw_string,
                                         backend_string)
    else:
        fn = '{}-{}.json'.format(model_string, test_type)

    if options is not None and options.scratch_dir is not None:
        fn = os.path.join(options.scratch_dir, fn)
    return fn


def run_download_tests(options=None):
    """
    Test model downloads through the registry (reference:
    md_tests.py:1604-1694): every known model downloads by canonical
    version and by short name, and the downloaded file's sniffed
    version matches. Models whose URLs are unreachable (zero-egress
    hosts) are reported as skipped rather than failed. Returns
    {model: 'ok'|'skipped: ...'}.
    """

    from megadetector_tpu.models.registry import (
        get_detector_version_from_model_file, known_models,
        model_string_to_model_version, try_download_known_detector)

    if options is None:
        options = MDTestOptions()

    status = {}
    for model_name in known_models:
        try:
            fn = try_download_known_detector(model_name,
                                             force_download=False,
                                             verbose=False)
            assert fn is not None and os.path.exists(fn)
            version_string = get_detector_version_from_model_file(fn)
            assert version_string.replace('.0.1', '.0.0') == \
                model_name.replace('.0.1', '.0.0')
            status[model_name] = 'ok'
        except Exception as e:
            status[model_name] = 'skipped: {}'.format(e)

    for short_name in model_string_to_model_version:
        assert model_string_to_model_version[short_name] in \
            known_models
    return status


def run_python_tests(options=None):
    """
    The Python-API test tiers (reference: md_tests.py:788-1111) —
    run_tests() without the CLI tier.
    """

    if options is None:
        options = MDTestOptions()
    options.skip_cli_tests = True
    return run_tests(options)


def run_tests(options=None):
    """
    Run the integration tiers. Raises AssertionError on the first
    failure; returns a dict of per-tier status on success.
    """

    from megadetector_tpu.detection.run_detector import load_detector
    from megadetector_tpu.detection.run_detector_batch import (
        load_and_run_detector_batch, write_results_to_file)
    from megadetector_tpu.postprocessing.validate_batch_results import (
        ValidateBatchResultsOptions, validate_batch_results)
    from megadetector_tpu.utils import md_tests as comparator
    from megadetector_tpu.utils.path_utils import find_images
    from megadetector_tpu.visualization.visualization_utils import \
        load_image

    if options is None:
        options = MDTestOptions()

    status = {}
    scratch, image_dir, video_dir, model_file = \
        _build_test_package(options)
    detector_options = {'force_cpu': 'true'} if options.force_cpu else {}

    def log(msg):
        if options.verbose:
            print('[md-tests] ' + msg)

    # --- Tier 1: single image vs batch consistency. With
    # pad_batches_to, the single-image call pads to the same compiled
    # program as the batch call, so results must match EXACTLY (with a
    # real model they also match across programs within tolerance; with
    # random weights, thousands of near-tied scores churn at the max_det
    # boundary between different batch programs, so program identity is
    # the right oracle here).
    tier1_options = dict(detector_options)
    tier1_options['pad_batches_to'] = 2
    detector = load_detector(model_file, detector_options=tier1_options)
    images = find_images(image_dir, recursive=True)
    good_images = [fn for fn in images if 'corrupt' not in fn]
    pil = load_image(good_images[0])
    single = detector.generate_detections_one_image(
        pil, good_images[0], detection_threshold=0.005)
    assert single['detections'] is not None
    batch = detector.generate_detections_one_batch(
        [load_image(fn) for fn in good_images[:2]], good_images[:2],
        detection_threshold=0.005)
    cmp_options = comparator.MDTestOptions()
    cmp_options.comparison_confidence_threshold = 0.1
    cmp_options.max_conf_error = options.max_conf_error
    cmp_options.max_coord_error = options.max_coord_error
    r = comparator.compare_detection_lists(
        single['detections'], batch[0]['detections'], cmp_options,
        image_id=good_images[0])
    assert not r['errors'], \
        'single-vs-batch mismatch: {}'.format(r['errors'][:3])
    log('tier 1 (single vs batch) OK')
    status['single_image'] = 'ok'

    # --- Tier 2: folder runs at two batch sizes must agree
    results_b2 = load_and_run_detector_batch(
        model_file, list(images), quiet=True, batch_size=2,
        detector_options=dict(detector_options))
    results_b4 = load_and_run_detector_batch(
        model_file, list(images), quiet=True, batch_size=4,
        detector_options=dict(detector_options))
    out_b2 = os.path.join(scratch, 'results_b2.json')
    out_b4 = os.path.join(scratch, 'results_b4.json')
    write_results_to_file(results_b2, out_b2,
                          relative_path_base=image_dir,
                          detector_file=model_file)
    write_results_to_file(results_b4, out_b4,
                          relative_path_base=image_dir,
                          detector_file=model_file)
    # Different batch sizes compile different programs whose conv
    # reductions differ in the last float bits; with a real model this is
    # far inside the tolerances, with random weights near-tied scores
    # churn at the max_det cut — so require a high match fraction rather
    # than exactness
    r = comparator.compare_results(out_b2, out_b4, cmp_options)
    n_matched = sum(len(im.get('detections') or [])
                    for im in results_b2 if im.get('detections'))
    assert len(r['errors']) <= max(3, n_matched // 10), \
        'batch-size variance: {} errors (sample: {})'.format(
            len(r['errors']), r['errors'][:3])
    v_options = ValidateBatchResultsOptions()
    v_options.raise_errors = True
    validate_batch_results(out_b2, v_options)
    log('tier 2 (batch-size invariance + format) OK')
    status['batch_folder'] = 'ok'

    # --- Optional golden comparison
    if options.expected_results_file is not None:
        r = comparator.compare_results(options.expected_results_file,
                                       out_b2, cmp_options)
        assert not r['errors'], \
            'golden mismatch: {}'.format(r['errors'][:5])
        log('golden comparison OK')
        status['golden'] = 'ok'

    # --- Tier 3: augmented inference runs and yields valid output
    augmented = detector.generate_detections_one_image(
        pil, good_images[0], detection_threshold=0.1, augment=True)
    assert augmented['detections'] is not None
    log('tier 3 (augmented) OK')
    status['augmented'] = 'ok'

    # --- Tier 4: video
    if not options.skip_video_tests:
        from megadetector_tpu.detection.process_video import (
            ProcessVideoOptions, process_videos)
        v_opts = ProcessVideoOptions()
        v_opts.model_file = model_file
        v_opts.input_video_file = video_dir
        v_opts.output_json_file = os.path.join(scratch, 'videos.json')
        v_opts.frame_sample = 4
        v_opts.detector_options = dict(detector_options)
        process_videos(v_opts)
        with open(v_opts.output_json_file) as f:
            vd = json.load(f)
        assert vd['images'][0]['frames_processed'] == [0, 4, 8]
        log('tier 4 (video) OK')
        status['video'] = 'ok'

    # --- Tier 5: tiled inference
    if not options.skip_tiled_tests:
        from megadetector_tpu.detection.run_tiled_inference import \
            run_tiled_inference
        run_tiled_inference(
            model_file, image_dir, os.path.join(scratch, 'tiles'),
            os.path.join(scratch, 'tiled.json'),
            tile_size_x=options.canvas_size,
            tile_size_y=options.canvas_size,
            detection_threshold=0.2,
            detector_options=dict(detector_options))
        log('tier 5 (tiled) OK')
        status['tiled'] = 'ok'

    # --- Tier 6: postprocessing + RDE on the folder results
    from megadetector_tpu.postprocessing.postprocess_batch_results \
        import PostProcessingOptions, process_batch_results
    p_opts = PostProcessingOptions()
    p_opts.md_results_file = out_b2
    p_opts.output_dir = os.path.join(scratch, 'preview')
    p_opts.image_base_dir = image_dir
    p_opts.num_images_to_sample = 10
    p_opts.parallelize_rendering = False
    process_batch_results(p_opts)

    from megadetector_tpu.postprocessing.repeat_detection_elimination \
        import repeat_detections_core as rde
    rde_options = rde.RepeatDetectionOptions()
    rde_options.bWriteFilteringFolder = False
    rde_options.nWorkers = 1
    rde.find_repeat_detections(
        out_b2, os.path.join(scratch, 'rde.json'), rde_options)
    log('tier 6 (postprocessing + RDE) OK')
    status['postprocessing'] = 'ok'

    # --- Tier 7: CLI tier — subprocess CLIs must produce detections
    # byte-identical to the API run (reference: md_tests.py:1116 +
    # output_files_are_identical :363-415)
    if not options.skip_cli_tests:
        status['cli'] = run_cli_tests(
            model_file, image_dir, scratch,
            api_results_file=out_b2, verbose=options.verbose)
        log('tier 7 (CLI) OK')

    if options.scratch_dir is None:
        shutil.rmtree(scratch, ignore_errors=True)

    log('all tiers passed')
    return status


def run_cli_tests(model_file, image_dir, scratch,
                  api_results_file=None, verbose=True):
    """
    Drive the batch CLI, validator CLI, and subset CLI as subprocesses;
    when [api_results_file] is given, the CLI detections must be
    byte-identical (modulo the info block's timestamp) to the API run.
    Returns 'ok' or raises.
    """

    import subprocess
    import sys

    cli_out = os.path.join(scratch, 'results_cli.json')
    cmd = [sys.executable, '-m',
           'megadetector_tpu.detection.run_detector_batch',
           model_file, image_dir, cli_out,
           '--recursive', '--output_relative_filenames',
           '--batch_size', '2', '--detector_options', 'force_cpu=true']
    r = subprocess.run(cmd, capture_output=True, text=True)
    assert r.returncode == 0, \
        'batch CLI failed:\n{}'.format(r.stderr[-2000:])

    r = subprocess.run(
        [sys.executable, '-m',
         'megadetector_tpu.postprocessing.validate_batch_results',
         cli_out], capture_output=True, text=True)
    assert r.returncode == 0, \
        'validator CLI failed:\n{}'.format(r.stderr[-2000:])

    if api_results_file is not None:
        with open(api_results_file) as f:
            api = json.load(f)
        with open(cli_out) as f:
            cli = json.load(f)
        # Identity modulo the info block (completion timestamps differ)
        assert api['images'] == cli['images'], \
            'CLI detections differ from the API run'
        assert api['detection_categories'] == \
            cli['detection_categories']

    # Subset CLI round trip
    subset_out = os.path.join(scratch, 'subset_cli.json')
    r = subprocess.run(
        [sys.executable, '-m',
         'megadetector_tpu.postprocessing.subset_json_detector_output',
         cli_out, subset_out, '--confidence_threshold', '0.5'],
        capture_output=True, text=True)
    assert r.returncode == 0, \
        'subset CLI failed:\n{}'.format(r.stderr[-2000:])
    if verbose:
        print('[md-tests] CLI tier: batch + validate + subset OK')
    return 'ok'


def main():
    import argparse
    import sys
    parser = argparse.ArgumentParser(
        description='Run the integration test tiers')
    parser.add_argument('--model_file', default=None,
                        help='converted .npz checkpoint (default: '
                             'synthetic random-weight model)')
    parser.add_argument('--expected_results_file', default=None)
    parser.add_argument('--scratch_dir', default=None)
    parser.add_argument('--skip_video_tests', action='store_true')
    parser.add_argument('--run_cli_tests', action='store_true',
                        help='also drive the module CLIs as '
                             'subprocesses (slow on 1 core)')
    parser.add_argument('--no_force_cpu', action='store_true')
    args = parser.parse_args()

    options = MDTestOptions()
    options.model_file = args.model_file
    options.expected_results_file = args.expected_results_file
    options.scratch_dir = args.scratch_dir
    options.skip_video_tests = args.skip_video_tests
    options.skip_cli_tests = not args.run_cli_tests
    options.force_cpu = not args.no_force_cpu
    status = run_tests(options)
    print(json.dumps(status))
    sys.exit(0)


if __name__ == '__main__':
    main()
