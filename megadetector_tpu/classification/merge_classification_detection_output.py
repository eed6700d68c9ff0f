"""
Merge classification results into an MD detections file.

Reference contract
(megadetector/classification/merge_classification_detection_output.py:
1-509): the input CSV is either an evaluate_model outputs CSV (with one
confidence column per label name) or a dataset CSV (with only a 'label'
column). Crop paths follow the ___cropXX[_mdvY.Y].jpg convention and
map back to (image file, detection index). Each crop's detection gains
a 'classifications' list:

- with per-label confidences: [[category_id, conf], ...] sorted
  descending by confidence (truncated to top_k);
- with only a ground-truth label: [[str(1000000 + label_id), 1.0]] —
  the 1e6 offset distinguishes label categories from predictions;
- with both, predictions plus the label entry (label last by default,
  first with label_first=True).

The output file carries 'classification_categories' built from the
label index (plus the offset label categories when present).
"""

import argparse
import json
import os
import sys

from datetime import datetime

from megadetector_tpu.utils import ct_utils
from megadetector_tpu.utils.ct_utils import round_float
from megadetector_tpu.classification.crop_detections import \
    parse_crop_filename

LABEL_CATEGORY_OFFSET = 1000000


def read_classification_csv(csv_path):
    """
    Read an outputs/dataset CSV; returns (rows, label_columns) where
    each row is {'path', 'label' (may be ''), 'probs': {name: conf}}.
    """

    rows = []
    with open(csv_path) as f:
        header = f.readline().rstrip('\n').split(',')
        assert header[0] == 'path', 'CSV must start with a path column'
        meta_cols = [c for c in header
                     if c in ('path', 'dataset', 'location',
                              'dataset_class', 'confidence', 'label',
                              'weight')]
        label_cols = [c for c in header if c not in meta_cols]
        for line in f:
            parts = line.rstrip('\n').split(',')
            if len(parts) < len(header):
                continue
            rec = dict(zip(header, parts))
            probs = {c: float(rec[c]) for c in label_cols}
            rows.append({'path': rec['path'],
                         'label': rec.get('label', ''),
                         'probs': probs})
    return rows, label_cols


def merge_classification_detection_output(
        classification_csv_path,
        detections_json_path,
        output_json_path,
        label_index_path=None,
        classifier_name='classifier',
        threshold=0.0,
        top_k=5,
        label_first=False):
    """
    Attach classifications from [classification_csv_path] to
    [detections_json_path]; writes the merged MD file to
    [output_json_path]. Returns the merged dict.
    """

    rows, label_cols = read_classification_csv(classification_csv_path)

    label_names = None
    if label_index_path is not None:
        with open(label_index_path) as f:
            label_index = json.load(f)
        label_names = [label_index[str(i)]
                       for i in range(len(label_index))]
    elif label_cols:
        label_names = label_cols

    name_to_id = {n: i for i, n in enumerate(label_names or [])}

    with open(detections_json_path) as f:
        data = json.load(f)
    det_by_file = {im['file']: im for im in data['images']}

    label_categories_used = {}
    n_merged = 0

    for row in rows:
        parsed = parse_crop_filename(row['path'])
        if parsed is None:
            continue
        image_file, crop_index = parsed
        im = det_by_file.get(image_file)
        if im is None or im.get('detections') is None or \
                crop_index >= len(im['detections']):
            continue
        det = im['detections'][crop_index]

        classifications = []
        if row['probs']:
            scored = sorted(row['probs'].items(),
                            key=lambda kv: -kv[1])[:top_k]
            for name, conf in scored:
                if conf < threshold or name not in name_to_id:
                    continue
                classifications.append(
                    [str(name_to_id[name]), round_float(conf, 4)])
        if row['label'] and row['label'] in name_to_id:
            label_id = str(LABEL_CATEGORY_OFFSET +
                           name_to_id[row['label']])
            label_categories_used[label_id] = row['label']
            entry = [label_id, 1.0]
            if row['probs']:
                if label_first:
                    classifications.insert(0, entry)
                else:
                    classifications.append(entry)
            else:
                classifications = [entry]
        if classifications:
            det['classifications'] = classifications
            n_merged += 1

    classification_categories = {
        str(i): n for i, n in enumerate(label_names or [])}
    classification_categories.update(label_categories_used)
    data['classification_categories'] = classification_categories
    info = data.setdefault('info', {})
    info['classifier'] = classifier_name
    info['classification_completion_time'] = \
        datetime.now().strftime('%Y-%m-%d %H:%M:%S')

    os.makedirs(os.path.dirname(os.path.abspath(output_json_path)),
                exist_ok=True)
    ct_utils.write_json(output_json_path, data)
    print('Merged classifications into {} detections -> {}'.format(
        n_merged, output_json_path))
    return data


def main():
    parser = argparse.ArgumentParser(
        description='Merge classification CSV results into an MD '
                    'detections file')
    parser.add_argument('classification_csv')
    parser.add_argument('detections_json')
    parser.add_argument('output_json')
    parser.add_argument('--label_index', default=None)
    parser.add_argument('--classifier_name', default='classifier')
    parser.add_argument('--threshold', type=float, default=0.0)
    parser.add_argument('--top_k', type=int, default=5)
    parser.add_argument('--label_first', action='store_true')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    merge_classification_detection_output(
        args.classification_csv, args.detections_json, args.output_json,
        label_index_path=args.label_index,
        classifier_name=args.classifier_name,
        threshold=args.threshold, top_k=args.top_k,
        label_first=args.label_first)


if __name__ == '__main__':
    main()
