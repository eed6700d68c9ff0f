"""
One-step detect + crop: run MegaDetector over an image folder and crop
the above-threshold detections for classifier training.

Reference role (megadetector/classification/detect_and_crop.py): the
orchestration that runs detection (there via the Batch API or a local
cached results file) and then crop_detections. Here it chains the TPU
batch driver with classification/crop_detections directly; an existing
detections file is reused instead of re-running detection
(the reference's detection cache).
"""

import argparse
import os
import sys

from megadetector_tpu.classification.crop_detections import \
    crop_detections


def load_detection_cache(detector_output_cache_dir, datasets):
    """
    Load cached per-dataset detector outputs (one MD results .json per
    dataset under [detector_output_cache_dir]); returns
    (detection_cache, detection_categories) where detection_cache maps
    dataset -> {image file -> image entry} (empty for datasets with no
    cache file) (reference: detect_and_crop.py:273-320).
    """

    import json

    detection_cache = {}
    detection_categories = {}
    for ds in datasets:
        cache_path = os.path.join(detector_output_cache_dir,
                                  '{}.json'.format(ds))
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                js = json.load(f)
            detection_cache[ds] = {im['file']: im
                                   for im in js['images']}
            categories = js.get('detection_categories', {})
            assert (not detection_categories) or \
                detection_categories == categories, \
                'Incompatible detection categories across cached files'
            detection_categories = categories
        else:
            print('No detection cache found for {}'.format(ds))
            detection_cache[ds] = {}
    return detection_cache, detection_categories


def detect_and_crop(model_file, images_dir, cropped_images_dir,
                    detections_json_path=None, threshold=0.8,
                    square_crops=False, detector_version=None,
                    batch_size=8, detector_options=None, logdir=None,
                    threads=1):
    """
    Returns (detections_json_path, n_crops, failed_images). When
    [detections_json_path] already exists it is reused (detection
    cache); otherwise detection runs and writes it there (default:
    <cropped_images_dir>/../detections.json).
    """

    if detections_json_path is None:
        detections_json_path = os.path.join(
            os.path.dirname(os.path.abspath(cropped_images_dir)),
            'detections.json')

    if not os.path.isfile(detections_json_path):
        from megadetector_tpu.detection.run_detector_batch import (
            load_and_run_detector_batch, write_results_to_file)
        from megadetector_tpu.utils.path_utils import find_images

        image_files = find_images(images_dir, recursive=True)
        results = load_and_run_detector_batch(
            model_file, image_files, batch_size=batch_size,
            detector_options=detector_options, quiet=True)
        write_results_to_file(
            results, detections_json_path,
            relative_path_base=images_dir,
            detector_file=model_file if isinstance(model_file, str)
            else None)
    else:
        print('Reusing cached detections at {}'.format(
            detections_json_path))

    n_crops, failed = crop_detections(
        detections_json_path, cropped_images_dir, images_dir,
        detector_version=detector_version, threshold=threshold,
        square_crops=square_crops, threads=threads, logdir=logdir,
        verbose=True)
    return detections_json_path, n_crops, failed


def main():
    parser = argparse.ArgumentParser(
        description='Run detection then crop above-threshold boxes')
    parser.add_argument('model_file')
    parser.add_argument('images_dir')
    parser.add_argument('cropped_images_dir')
    parser.add_argument('--detections_json', default=None)
    parser.add_argument('--threshold', type=float, default=0.8)
    parser.add_argument('--square_crops', action='store_true')
    parser.add_argument('--detector_version', default=None)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--threads', type=int, default=1)
    parser.add_argument('--logdir', default=None)
    parser.add_argument('--detector_options', nargs='*', default=None)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    from megadetector_tpu.utils import ct_utils
    detect_and_crop(
        args.model_file, args.images_dir, args.cropped_images_dir,
        detections_json_path=args.detections_json,
        threshold=args.threshold, square_crops=args.square_crops,
        detector_version=args.detector_version,
        batch_size=args.batch_size,
        detector_options=ct_utils.parse_kvp_list(args.detector_options),
        logdir=args.logdir, threads=args.threads)


if __name__ == '__main__':
    main()
