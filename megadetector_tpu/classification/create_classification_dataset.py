"""
Build a classification dataset CSV + label index + location-aware
train/val/test splits from a "queried images" JSON and a crop folder.

Reference contract
(megadetector/classification/create_classification_dataset.py:1-626):

- input: queried_images.json mapping '<dataset>/<file>' to
  {'dataset', 'location', 'class', 'label': [..], optional 'bbox'}
  (ground-truth boxes crop with confidence 1.0; MegaDetector boxes
  carry their detection confidence)
- outputs, in <output_dir>:
  1) classification_ds.csv with columns
     path,dataset,location,dataset_class,confidence,label
  2) label_index.json: {"0": label_name, ...} sorted label names
  3) splits.json: {'train'|'val'|'test': [[dataset, location], ...]}

Splitting is by (dataset, location) so no camera location leaks across
splits (the assumption that (dataset, location) is globally unique is
inherited from the reference). The reference solves a small
optimization; this implementation uses a seeded greedy assignment that
balances each label's crop counts toward the requested fractions —
same contract, simpler machinery.
"""

import argparse
import collections
import json
import os
import random
import sys

from megadetector_tpu.utils import ct_utils
from megadetector_tpu.classification.crop_detections import (
    crop_filename, parse_crop_filename)


def build_crop_rows(queried_images, cropped_images_dir,
                    detections=None, detector_version=None,
                    confidence_threshold=0.0,
                    require_crop_files=True):
    """
    One CSV row per crop. Ground-truth 'bbox' entries yield confidence
    1.0; otherwise detections from [detections] (an MD results dict
    keyed by file) yield their detection confidence.

    Returns a list of row dicts.
    """

    det_by_file = {}
    if detections is not None:
        det_by_file = {im['file']: im for im in detections['images']}

    rows = []
    for img_path, info in queried_images.items():
        dataset = info.get('dataset',
                           img_path.split('/', 1)[0]
                           if '/' in img_path else '')
        location = str(info.get('location', 'unknown'))
        dataset_class = info.get('class', '')
        label = ','.join(info.get('label', []))

        crops = []
        if 'bbox' in info:
            for i_box, _ in enumerate(info['bbox']):
                crops.append((i_box, 1.0, None))
        else:
            im = det_by_file.get(img_path)
            if im is None or im.get('detections') is None:
                continue
            for i_det, det in enumerate(im['detections']):
                if det['conf'] >= confidence_threshold:
                    crops.append((i_det, det['conf'], detector_version))

        for i_crop, conf, version in crops:
            rel = crop_filename(img_path, i_crop, version)
            if require_crop_files and not os.path.isfile(
                    os.path.join(cropped_images_dir, rel)):
                continue
            rows.append({
                'path': rel,
                'dataset': dataset,
                'location': location,
                'dataset_class': dataset_class,
                'confidence': conf,
                'label': label,
            })
    return rows


def split_locations(rows, split_fractions=(0.7, 0.15, 0.15), seed=0):
    """
    Assign (dataset, location) pairs to train/val/test greedily: visit
    locations in seeded-shuffled order (largest-first within the
    shuffle tiers) and give each to the split currently furthest below
    its target crop count. Returns {'train': [[dataset, location]...],
    'val': ..., 'test': ...}.
    """

    assert abs(sum(split_fractions) - 1.0) < 1e-6
    loc_counts = collections.Counter(
        (r['dataset'], r['location']) for r in rows)
    locations = list(loc_counts.keys())
    random.Random(seed).shuffle(locations)
    locations.sort(key=lambda lc: -loc_counts[lc])

    names = ['train', 'val', 'test']
    total = sum(loc_counts.values())
    targets = {name: f * total
               for name, f in zip(names, split_fractions)}
    assigned = {name: 0 for name in names}
    splits = {name: [] for name in names}

    for lc in locations:
        # Furthest below target (relative deficit)
        name = max(names, key=lambda n: (targets[n] - assigned[n]) /
                   max(targets[n], 1e-9))
        splits[name].append([lc[0], lc[1]])
        assigned[name] += loc_counts[lc]
    return splits


def create_classification_dataset(queried_images_json,
                                  cropped_images_dir,
                                  output_dir,
                                  detections_json=None,
                                  detector_version=None,
                                  confidence_threshold=0.0,
                                  split_fractions=(0.7, 0.15, 0.15),
                                  seed=0,
                                  require_crop_files=True):
    """
    Write classification_ds.csv, label_index.json, and splits.json to
    [output_dir]. Returns (rows, label_index, splits).
    """

    with open(queried_images_json) as f:
        queried_images = json.load(f)
    detections = None
    if detections_json is not None:
        with open(detections_json) as f:
            detections = json.load(f)
        if detector_version is None:
            # Derive the crop-name suffix the same way crop_detections
            # does, so default-pipeline crop names line up
            from megadetector_tpu.classification.crop_detections import \
                detector_version_from_results
            detector_version = detector_version_from_results(detections)

    rows = build_crop_rows(queried_images, cropped_images_dir,
                           detections=detections,
                           detector_version=detector_version,
                           confidence_threshold=confidence_threshold,
                           require_crop_files=require_crop_files)

    if len(rows) == 0 and require_crop_files and \
            len(queried_images) > 0:
        print('Warning: no crop rows survived the crop-file existence '
              'check; if crops exist, the detector_version used to '
              'name them (current: {}) may not match'.format(
                  detector_version))

    labels = sorted({lbl for r in rows for lbl in r['label'].split(',')
                     if lbl})
    label_index = {str(i): name for i, name in enumerate(labels)}

    splits = split_locations(rows, split_fractions=split_fractions,
                             seed=seed)

    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, 'classification_ds.csv')
    with open(csv_path, 'w') as f:
        f.write('path,dataset,location,dataset_class,confidence,label\n')
        for r in rows:
            f.write('{path},{dataset},{location},{dataset_class},'
                    '{confidence},{label}\n'.format(**r))
    ct_utils.write_json(os.path.join(output_dir, 'label_index.json'),
                        label_index)
    ct_utils.write_json(os.path.join(output_dir, 'splits.json'), splits)

    print('Wrote {} crop rows, {} labels, splits to {}'.format(
        len(rows), len(labels), output_dir))
    return rows, label_index, splits


def load_dataset_csv(csv_path):
    """Read classification_ds.csv back into a list of row dicts."""

    rows = []
    with open(csv_path) as f:
        header = f.readline().strip().split(',')
        for line in f:
            parts = line.rstrip('\n').split(',', len(header) - 1)
            rows.append(dict(zip(header, parts)))
    return rows


def rows_for_split(rows, splits, split_name):
    """Rows whose (dataset, location) belongs to [split_name]."""

    members = {tuple(lc) for lc in splits[split_name]}
    return [r for r in rows
            if (r['dataset'], str(r['location'])) in members]


def main():
    parser = argparse.ArgumentParser(
        description='Create a classification dataset CSV + splits')
    parser.add_argument('output_dir')
    parser.add_argument('--queried_images_json', required=True)
    parser.add_argument('--cropped_images_dir', required=True)
    parser.add_argument('--detections_json', default=None)
    parser.add_argument('--detector_version', default=None)
    parser.add_argument('--confidence_threshold', type=float, default=0.0)
    parser.add_argument('--val_frac', type=float, default=0.15)
    parser.add_argument('--test_frac', type=float, default=0.15)
    parser.add_argument('--seed', type=int, default=0)

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    fractions = (1.0 - args.val_frac - args.test_frac, args.val_frac,
                 args.test_frac)
    create_classification_dataset(
        args.queried_images_json, args.cropped_images_dir,
        args.output_dir, detections_json=args.detections_json,
        detector_version=args.detector_version,
        confidence_threshold=args.confidence_threshold,
        split_fractions=fractions, seed=args.seed)


if __name__ == '__main__':
    main()
