"""
Classical-CV change detection for pre-filtering camera-trap images:
frame-differencing / background-subtraction over the time-sorted images of
each camera folder, flagging images with motion.

Behavioral contract follows the reference
(megadetector/detection/change_detection.py:33-711): methods frame_diff /
MOG2 / KNN, global or Otsu thresholding, per-camera-folder processing,
CSV output of per-image motion scores. This stays host-side (cv2); it is
a cheap pre-filter, not a TPU workload.
"""

import argparse
import csv
import os
import sys

from collections import defaultdict

from tqdm import tqdm

from megadetector_tpu.utils import ct_utils
from megadetector_tpu.utils.path_utils import find_images

try:
    import cv2
    import numpy as np
except ImportError:  # pragma: no cover
    cv2 = None


class ChangeDetectionMethod:
    FRAME_DIFF = 'frame_diff'
    MOG2 = 'mog2'
    KNN = 'knn'


class ThresholdMethod:
    GLOBAL = 'global'
    OTSU = 'otsu'


class ChangeDetectionOptions:
    """Options controlling process_folders()."""

    def __init__(self):
        self.method = ChangeDetectionMethod.FRAME_DIFF
        self.threshold_method = ThresholdMethod.GLOBAL
        # Pixel-difference threshold (global mode)
        self.diff_threshold = 25
        # Fraction of changed pixels above which an image is "motion"
        self.motion_fraction_threshold = 0.002
        # Downscale long side before comparison
        self.comparison_width = 640
        self.blur_kernel = 5
        self.verbose = False


def _load_gray(path, width):
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        return None
    if img.shape[1] > width:
        scale = width / img.shape[1]
        img = cv2.resize(img, (width, int(round(img.shape[0] * scale))))
    return img


def detect_motion(images, options=None):
    """
    Motion scores for a time-ordered list of image paths from one camera.

    Returns a list of dicts: {'file', 'motion_fraction', 'motion'} (the
    first image of a folder has no baseline and scores 0).
    """

    assert cv2 is not None, 'OpenCV is required for change detection'
    if options is None:
        options = ChangeDetectionOptions()

    results = []
    subtractor = None
    if options.method == ChangeDetectionMethod.MOG2:
        subtractor = cv2.createBackgroundSubtractorMOG2(
            detectShadows=False)
    elif options.method == ChangeDetectionMethod.KNN:
        subtractor = cv2.createBackgroundSubtractorKNN(
            detectShadows=False)

    prev = None
    for path in images:
        img = _load_gray(path, options.comparison_width)
        if img is None:
            results.append({'file': path, 'motion_fraction': -1.0,
                            'motion': False, 'failure': True})
            continue
        if options.blur_kernel > 1:
            img = cv2.GaussianBlur(img, (options.blur_kernel,
                                         options.blur_kernel), 0)

        if subtractor is not None:
            mask = subtractor.apply(img)
            fraction = float(np.count_nonzero(mask)) / mask.size
            # The first frame trains the model; score it 0
            if prev is None:
                fraction = 0.0
        else:
            if prev is None or prev.shape != img.shape:
                fraction = 0.0
            else:
                diff = cv2.absdiff(img, prev)
                if options.threshold_method == ThresholdMethod.OTSU:
                    _, mask = cv2.threshold(
                        diff, 0, 255,
                        cv2.THRESH_BINARY + cv2.THRESH_OTSU)
                else:
                    _, mask = cv2.threshold(
                        diff, options.diff_threshold, 255,
                        cv2.THRESH_BINARY)
                fraction = float(np.count_nonzero(mask)) / mask.size

        results.append({
            'file': path,
            'motion_fraction': fraction,
            'motion': fraction >= options.motion_fraction_threshold,
        })
        prev = img

    return results


def process_camera_folder(folder, image_files, options=None):
    """Run motion detection on one camera folder's images (sorted)."""

    return detect_motion(sorted(image_files), options)


def process_folders(input_folder, output_csv=None, options=None,
                    recursive=True):
    """
    Run motion detection over every camera folder under [input_folder];
    writes a CSV of per-image scores when [output_csv] is given. Returns
    the list of result dicts.
    """

    if options is None:
        options = ChangeDetectionOptions()

    images = find_images(input_folder, recursive=recursive)
    folder_to_images = defaultdict(list)
    for fn in images:
        folder_to_images[os.path.dirname(fn)].append(fn)

    all_results = []
    for folder in tqdm(sorted(folder_to_images.keys()),
                       desc='Processing camera folders'):
        all_results.extend(process_camera_folder(
            folder, folder_to_images[folder], options))

    if output_csv is not None:
        with open(output_csv, 'w', newline='') as f:
            writer = csv.writer(f)
            writer.writerow(['file', 'motion_fraction', 'motion'])
            for r in all_results:
                writer.writerow([
                    os.path.relpath(r['file'], input_folder),
                    '{:.5f}'.format(r['motion_fraction']),
                    int(r['motion'])])
        print('Wrote motion scores to {}'.format(output_csv))

    n_motion = sum(1 for r in all_results if r['motion'])
    print('Flagged {} of {} images as motion'.format(
        n_motion, len(all_results)))
    return all_results


def main():
    parser = argparse.ArgumentParser(
        description='Classical-CV motion detection pre-filter')
    parser.add_argument('input_folder')
    parser.add_argument('output_csv')
    parser.add_argument('--method', default='frame_diff',
                        choices=['frame_diff', 'mog2', 'knn'])
    parser.add_argument('--diff_threshold', type=int, default=25)
    parser.add_argument('--motion_fraction_threshold', type=float,
                        default=0.002)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    options = ChangeDetectionOptions()
    ct_utils.args_to_object(args, options)
    process_folders(args.input_folder, args.output_csv, options)


if __name__ == '__main__':
    main()
