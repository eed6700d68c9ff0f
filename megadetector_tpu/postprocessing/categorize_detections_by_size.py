"""
Tag detections by relative box size, adding size categories to the results
file so downstream tools (previews, folder separation) can distinguish
e.g. large animals from small ones.

Behavioral contract follows the reference
(megadetector/postprocessing/categorize_detections_by_size.py:53): boxes
whose relative dimension exceeds the threshold get a new category like
'large_detection_animal'; everything else keeps its category.
"""

import argparse
import json
import sys

from megadetector_tpu.utils import ct_utils


class SizeCategorizationOptions:
    """Options controlling categorize_detections_by_size()."""

    def __init__(self):
        # Thresholds on the relative size measure, descending; each gets
        # its own category
        self.size_thresholds = [0.95]
        # 'size' (w*h), 'width', or 'height'
        self.measurement = 'size'
        # Categories eligible for recategorization (None = all)
        self.categories_to_separate = ['1']
        self.separate_unique_categories = True


def _measure(det, measurement):
    x, y, w, h = det['bbox']
    if measurement == 'size':
        return w * h
    if measurement == 'width':
        return w
    if measurement == 'height':
        return h
    raise ValueError('Unknown measurement {}'.format(measurement))


def categorize_detections_by_size(input_file, output_file=None,
                                  options=None):
    """
    Add size-based detection categories; returns the rewritten dict and
    writes [output_file] when given.
    """

    if options is None:
        options = SizeCategorizationOptions()

    with open(input_file) as f:
        data = json.load(f)

    detection_categories = data['detection_categories']
    thresholds = sorted(options.size_thresholds, reverse=True)

    # Allocate new category IDs
    next_id = max(int(k) for k in detection_categories) + 1
    threshold_to_category = {}
    for t in thresholds:
        new_id = str(next_id)
        next_id += 1
        detection_categories[new_id] = \
            'large_detection_{}'.format(t)
        threshold_to_category[t] = new_id

    n_changed = 0
    for im in data['images']:
        for det in im.get('detections') or []:
            if options.categories_to_separate is not None and \
                    det['category'] not in options.categories_to_separate:
                continue
            m = _measure(det, options.measurement)
            for t in thresholds:
                if m >= t:
                    det['category'] = threshold_to_category[t]
                    n_changed += 1
                    break

    print('Recategorized {} detections'.format(n_changed))
    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data


def main():
    parser = argparse.ArgumentParser(
        description='Tag detections by relative box size')
    parser.add_argument('input_file')
    parser.add_argument('output_file')
    parser.add_argument('--thresholds', nargs='+', type=float,
                        default=[0.95])
    parser.add_argument('--measurement', default='size',
                        choices=['size', 'width', 'height'])

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    options = SizeCategorizationOptions()
    options.size_thresholds = args.thresholds
    options.measurement = args.measurement
    categorize_detections_by_size(args.input_file, args.output_file,
                                  options)


if __name__ == '__main__':
    main()
