"""
Detector loading and the simple single-image / few-images driver.

Module-level API mirrors the reference (megadetector/detection/
run_detector.py): load_detector() factory at :601, load_and_run_detector()
demo driver at :688, is_gpu_available() at :554, plus the failure-string /
precision constants and the default label map. The registry tables live in
models/registry.py.
"""

import argparse
import os
import sys
import time

import numpy as np

from megadetector_tpu.models import registry
from megadetector_tpu.models.registry import (  # noqa: F401  (public API)
    known_models,
    model_string_to_model_version,
    get_detector_metadata_from_version_string,
    get_detector_version_from_filename,
    get_detector_version_from_model_file,
    try_download_known_detector,
    DEFAULT_RENDERING_CONFIDENCE_THRESHOLD,
    DEFAULT_OUTPUT_CONFIDENCE_THRESHOLD,
)
from megadetector_tpu.models.detector import (  # noqa: F401  (public API)
    FAILURE_INFER,
    FAILURE_IMAGE_OPEN,
    CONF_DIGITS,
    COORD_DIGITS,
    DEFAULT_DETECTOR_LABEL_MAP,
    TPUDetector,
)
from megadetector_tpu.utils import ct_utils
from megadetector_tpu.utils import path_utils
from megadetector_tpu.visualization import visualization_utils as vis_utils

DEFAULT_BOX_THICKNESS = 4
DEFAULT_BOX_EXPANSION = 0
DEFAULT_LABEL_FONT_SIZE = 16
DETECTION_FILENAME_INSERT = '_detections'


def is_gpu_available(detector_file=None):
    """
    True when a JAX accelerator (TPU or GPU) is available
    (reference analog: run_detector.py:554, which probes torch/TF).
    """

    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform not in ('cpu',)


def get_accelerator_summary():
    """Human-readable device summary (platform x count)."""

    import jax
    devices = jax.devices()
    return '{} x {}'.format(len(devices), devices[0].device_kind
                            if hasattr(devices[0], 'device_kind')
                            else devices[0].platform)


def get_typical_confidence_threshold_from_results(results):
    """
    A sensible default display/analysis threshold for an MD results
    dict or .json filename: detector_metadata's value when present,
    else inferred from the detector version, else the MDv5 default
    (reference: run_detector.py:504-550).
    """

    import json

    if isinstance(results, str):
        with open(results) as f:
            results = json.load(f)

    info = results.get('info', {})
    metadata = info.get('detector_metadata', {})
    if 'typical_detection_threshold' in metadata:
        return metadata['typical_detection_threshold']

    if not info.get('detector'):
        print('Warning: detector version not available in results '
              'file, using MDv5 defaults')
        return get_detector_metadata_from_version_string(
            'v5a.0.0')['typical_detection_threshold']

    print('Warning: detector metadata not available in results file, '
          'inferring from MD version')
    try:
        version = get_detector_version_from_filename(info['detector'])
        metadata = get_detector_metadata_from_version_string(version)
        return metadata.get(
            'typical_detection_threshold',
            get_detector_metadata_from_version_string(
                'v5a.0.0')['typical_detection_threshold'])
    except Exception:
        return get_detector_metadata_from_version_string(
            'v5a.0.0')['typical_detection_threshold']


#: MDv5-equivalent single-device throughput by device-kind substring
#: (img/s). GPU rows are the reference's published numbers
#: (megadetector.md:350-359); TPU rows are this repo's measured
#: batched int8-chain numbers (BENCH history, NEXT.md).
#: Keys are matched as case-insensitive substrings of the JAX
#: device_kind, first match wins — real device_kind strings are e.g.
#: 'TPU v5 lite' (v5e), 'TPU v5p', 'TPU v4', 'TPU v6 lite'. Keep the
#: more specific keys ('v5 lite') ahead of shorter prefixes ('v5').
DEVICE_KIND_TO_MDV5_IMAGES_PER_SECOND = {
    'v5 lite': 439.5,  # v5e device_kind as JAX reports it
    'v5litepod': 439.5,
    'v5e': 439.5,
    'v6 lite': 439.5,  # not measured; v5e number as a floor
    'v6e': 439.5,
    'v5p': 439.5,      # not measured; v5e number as a floor
    'v5': 439.5,
    'v4': 300.0,       # not measured; scaled by relative peak TOPS
    '4090': 17.6,
    '3090': 11.4,
    '3080': 9.5,
    '3050': 4.2,
    'P2000': 2.1,
}


def estimate_md_images_per_second(model_file, device_name=None):
    """
    Rough throughput estimate for [model_file] on the current (or
    named) device, from the benchmark lookup table and the model's
    speed ratio vs MDv5 (reference: run_detector.py:448-501). Returns
    None when either the device or the model version is unknown.
    """

    if device_name is None:
        try:
            import jax
            device = jax.devices()[0]
            device_name = getattr(device, 'device_kind',
                                  device.platform)
        except Exception as e:
            print('Error querying device name: {}'.format(e))
            return None

    model_version = get_detector_version_from_model_file(model_file)
    if model_version not in known_models:
        print('Could not estimate inference speed for model file '
              '{}'.format(model_file))
        return None
    model_info = known_models[model_version]
    speed_ratio = model_info.get('normalized_typical_inference_speed')
    if speed_ratio is None:
        print('No speed ratio available for model version {}'.format(
            model_version))
        return None

    for kind, mdv5_speed in \
            DEVICE_KIND_TO_MDV5_IMAGES_PER_SECOND.items():
        if kind.lower() in str(device_name).lower():
            return mdv5_speed * speed_ratio
    print('No speed estimate available for device {}'.format(
        device_name))
    return None


def load_detector(model_file, force_cpu=False, detector_options=None,
                  verbose=False):
    """
    Load a detector from a model name ('MDV5A') or file path. Converted
    TPU checkpoints (.npz / checkpoint dirs) load directly; original torch
    .pt files are converted on the fly when torch is available
    (reference factory semantics: run_detector.py:601-683).
    """

    detector_options = dict(detector_options or {})
    if force_cpu:
        detector_options['force_cpu'] = True

    model_file = try_download_known_detector(model_file, verbose=verbose)

    assert model_file is not None and os.path.exists(model_file), \
        'Model file {} does not exist'.format(model_file)

    start = time.time()

    if model_file.endswith('.pt'):
        # Original torch checkpoint: convert once, cache, then load the
        # converted artifact. The cache key includes a content hash of
        # the .pt file — a user-supplied checkpoint that merely NAMES a
        # known version (e.g. a fine-tune called my_v5a.0.1.pt) must
        # never silently resolve to the stock converted weights, and
        # converting it must never poison the stock cache entry.
        import hashlib
        from megadetector_tpu.models.convert_weights import \
            convert_megadetector_checkpoint
        version = registry.get_detector_version_from_model_file(model_file)
        with open(model_file, 'rb') as f:
            head = f.read(1 << 20)
            f.seek(0, os.SEEK_END)
            size = f.tell()
        digest = hashlib.sha256(
            head + str(size).encode()).hexdigest()[:10]
        out_path = os.path.join(
            registry.get_default_model_folder(),
            'md_{}_{}.npz'.format(version or
                                  os.path.basename(model_file),
                                  digest))
        if not os.path.isfile(out_path):
            print('Converting torch checkpoint {} -> {}'.format(
                model_file, out_path))
            convert_megadetector_checkpoint(
                model_file, out_path, model_version=version,
                verbose=verbose)
        model_file = out_path
    elif model_file.endswith('.pb'):
        # Legacy MDv2-v4 frozen graphs: TF CPU runtime (no TPU path)
        from megadetector_tpu.detection.tf_detector import TFDetector
        detector = TFDetector(model_file,
                              detector_options=detector_options,
                              verbose=verbose)
        elapsed = time.time() - start
        print('Loaded model in {:.2f} seconds'.format(elapsed))
        return detector
    elif model_file.endswith('.mdpkg'):
        # AOT artifact: serialized StableHLO programs with weights baked
        # in (detection/export_detector.py)
        from megadetector_tpu.detection.export_detector import \
            ExportedDetector
        detector = ExportedDetector(model_file,
                                    detector_options=detector_options,
                                    verbose=verbose)
        elapsed = time.time() - start
        print('Loaded model in {:.2f} seconds'.format(elapsed))
        return detector

    detector = TPUDetector(model_file, detector_options=detector_options,
                           verbose=verbose)

    elapsed = time.time() - start
    print('Loaded model in {:.2f} seconds'.format(elapsed))
    return detector


def load_and_run_detector(model_file, image_file_names, output_dir,
                          render_confidence_threshold=
                          DEFAULT_RENDERING_CONFIDENCE_THRESHOLD,
                          box_thickness=DEFAULT_BOX_THICKNESS,
                          box_expansion=DEFAULT_BOX_EXPANSION,
                          image_size=None,
                          label_font_size=DEFAULT_LABEL_FONT_SIZE,
                          augment=False,
                          detector_options=None):
    """
    Run a detector over a short list of images, rendering boxes to
    [output_dir] (the reference demo driver: run_detector.py:688-878).
    Returns the list of MD-format results.
    """

    if len(image_file_names) == 0:
        print('Warning: no files available')
        return []

    detector = load_detector(model_file,
                             detector_options=detector_options)
    os.makedirs(output_dir, exist_ok=True)

    detection_results = []
    time_load = []
    time_infer = []

    # Unique output filenames even with collisions across folders
    output_filename_collision_counts = {}

    def input_file_to_detection_file(fn, crop_index=-1):
        fn = os.path.basename(fn).lower()
        name, ext = os.path.splitext(fn)
        if crop_index >= 0:
            name += '_crop{:0>2d}'.format(crop_index)
        fn = '{}{}{}'.format(name, DETECTION_FILENAME_INSERT, '.jpg')
        if fn in output_filename_collision_counts:
            n_collisions = output_filename_collision_counts[fn]
            # Increment under the ORIGINAL key so the 3rd+ duplicate
            # gets a fresh prefix instead of overwriting the 2nd
            output_filename_collision_counts[fn] = n_collisions + 1
            fn = '{:0>4d}'.format(n_collisions) + '_' + fn
        else:
            output_filename_collision_counts[fn] = 0
        return os.path.join(output_dir, fn)

    for im_file in image_file_names:

        try:
            start_time = time.time()
            image = vis_utils.load_image(im_file)
            time_load.append(time.time() - start_time)
        except Exception as e:
            print('Image {} cannot be loaded. Exception: {}'.format(
                im_file, e))
            detection_results.append({
                'file': im_file,
                'detections': None,
                'failure': FAILURE_IMAGE_OPEN,
            })
            continue

        try:
            start_time = time.time()
            result = detector.generate_detections_one_image(
                image, im_file,
                detection_threshold=DEFAULT_OUTPUT_CONFIDENCE_THRESHOLD,
                image_size=image_size, augment=augment)
            detection_results.append(result)
            time_infer.append(time.time() - start_time)
        except Exception as e:
            from megadetector_tpu.models.detector import \
                PROGRAMMING_ERRORS, reraise_programming_errors
            if isinstance(e, PROGRAMMING_ERRORS) and \
                    reraise_programming_errors():
                raise
            print('An error occurred while running the detector on image '
                  '{}: {}'.format(im_file, e))
            detection_results.append({
                'file': im_file,
                'detections': None,
                'failure': FAILURE_INFER,
            })
            continue

        try:
            vis_utils.render_detection_bounding_boxes(
                result['detections'], image,
                label_map=DEFAULT_DETECTOR_LABEL_MAP,
                confidence_threshold=render_confidence_threshold,
                thickness=box_thickness, expansion=box_expansion,
                label_font_size=label_font_size)
            output_full_path = input_file_to_detection_file(im_file)
            image.save(output_full_path)
        except Exception as e:
            print('Rendering error for image {}: {}'.format(im_file, e))

    if len(time_load) > 0:
        print('Average image loading time: {:.3f}s'.format(
            float(np.mean(time_load))))
    if len(time_infer) > 0:
        print('Average inference time: {:.3f}s'.format(
            float(np.mean(time_infer))))

    return detection_results


def main():

    parser = argparse.ArgumentParser(
        description='Run MegaDetector (TPU) on one or more images, '
                    'rendering boxes')
    parser.add_argument(
        'detector_file',
        help='model file or known model name (e.g. "MDV5A")')
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument('--image_file',
                       help='single image to process')
    group.add_argument('--image_dir',
                       help='folder of images to process')
    parser.add_argument('--recursive', action='store_true',
                        help='recurse into --image_dir')
    parser.add_argument('--output_dir',
                        help='folder for rendered images')
    parser.add_argument('--image_size', type=int, default=None,
                        help='inference canvas size (long side)')
    parser.add_argument('--threshold', type=float,
                        default=DEFAULT_RENDERING_CONFIDENCE_THRESHOLD,
                        help='rendering confidence threshold')
    parser.add_argument('--box_thickness', type=int,
                        default=DEFAULT_BOX_THICKNESS)
    parser.add_argument('--box_expansion', type=int,
                        default=DEFAULT_BOX_EXPANSION)
    parser.add_argument('--label_font_size', type=float,
                        default=DEFAULT_LABEL_FONT_SIZE)
    parser.add_argument('--augment', action='store_true')
    parser.add_argument('--detector_options', nargs='*', default=None,
                        help='detector options as space-separated '
                             'key=value pairs')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    detector_options = ct_utils.parse_kvp_list(args.detector_options)

    if args.image_file:
        image_file_names = [args.image_file]
    else:
        image_file_names = path_utils.find_images(args.image_dir,
                                                  args.recursive)

    if args.output_dir is None:
        if args.image_file:
            args.output_dir = os.path.dirname(args.image_file) or '.'
        else:
            args.output_dir = args.image_dir

    load_and_run_detector(
        model_file=args.detector_file,
        image_file_names=image_file_names,
        output_dir=args.output_dir,
        render_confidence_threshold=args.threshold,
        box_thickness=args.box_thickness,
        box_expansion=args.box_expansion,
        image_size=args.image_size,
        label_font_size=args.label_font_size,
        augment=args.augment,
        detector_options=detector_options)


if __name__ == '__main__':
    main()
