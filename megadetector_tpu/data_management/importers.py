"""
Importers: convert third-party camera-trap tool outputs into the MD
results format so the whole postprocessing ecosystem applies to them.

Behavioral contract follows the reference's importer family
(megadetector/data_management/: zamba_to_md.py, animl_to_md.py,
camtrap_dp_to_md.py, mewc_to_md.py): each maps a tool's CSV/JSON output
onto MD images/detections with string-int categories.
"""

import argparse
import csv
import json
import os
import sys

from megadetector_tpu.utils import ct_utils

DEFAULT_CATEGORIES = {'1': 'animal', '2': 'person', '3': 'vehicle'}


def _base_output(detector_name):
    return {'images': [],
            'detection_categories': dict(DEFAULT_CATEGORIES),
            'info': {'format_version': '1.6',
                     'detector': detector_name}}


def zamba_to_md(input_csv, output_file=None):
    """
    Convert zamba video-classification output (CSV: filepath + one
    probability column per species) to MD format: one video record per
    row, the species probabilities as full-frame classifications on a
    synthetic animal detection.
    """

    with open(input_csv, newline='') as f:
        rows = list(csv.DictReader(f))
    assert len(rows) > 0, 'Empty zamba CSV'

    species = [c for c in rows[0].keys() if c not in ('filepath', 'path')]
    classification_categories = {str(i): name
                                 for i, name in enumerate(species)}

    data = _base_output('zamba')
    data['classification_categories'] = classification_categories

    for row in rows:
        fn = row.get('filepath') or row.get('path')
        probs = sorted(
            ((str(i), float(row[name] or 0))
             for i, name in enumerate(species)),
            key=lambda kv: -kv[1])
        top_prob = probs[0][1]
        blank_ids = [str(i) for i, name in enumerate(species)
                     if name.lower() == 'blank']
        is_blank = blank_ids and probs[0][0] in blank_ids
        im = {'file': fn}
        if is_blank:
            im['detections'] = []
        else:
            im['detections'] = [{
                'category': '1',
                'conf': round(top_prob, 3),
                'bbox': [0.0, 0.0, 1.0, 1.0],
                'classifications': [[c, round(p, 4)]
                                    for c, p in probs[:3]],
            }]
        data['images'].append(im)

    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data


def animl_to_md(input_csv, output_file=None):
    """
    Convert animl detection CSV (columns FilePath/category/conf plus
    bbox1..bbox4 as x/y/w/h normalized) to MD format.
    """

    with open(input_csv, newline='') as f:
        rows = list(csv.DictReader(f))

    data = _base_output('animl')
    fn_to_detections = {}

    for row in rows:
        fn = row.get('FilePath') or row.get('file') or row.get('Frame')
        fn_to_detections.setdefault(fn, [])
        category = row.get('category') or row.get('class')
        conf = row.get('conf') or row.get('confidence')
        if category is None or conf is None or float(conf) <= 0:
            continue
        bbox = [float(row.get('bbox1', 0)), float(row.get('bbox2', 0)),
                float(row.get('bbox3', 0)), float(row.get('bbox4', 0))]
        fn_to_detections[fn].append({
            'category': str(int(float(category))),
            'conf': round(float(conf), 3),
            'bbox': ct_utils.round_float_array(bbox, 4),
        })

    for fn, detections in fn_to_detections.items():
        data['images'].append({'file': fn, 'detections': detections})

    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data


def camtrap_dp_to_md(package_folder, output_file=None):
    """
    Convert a Camtrap DP data package (datapackage.json + media.csv +
    observations.csv) to MD format: one image per media record,
    observations as full-frame or bbox detections.
    """

    media_file = os.path.join(package_folder, 'media.csv')
    obs_file = os.path.join(package_folder, 'observations.csv')
    assert os.path.isfile(media_file) and os.path.isfile(obs_file), \
        'Not a Camtrap DP package: {}'.format(package_folder)

    with open(media_file, newline='') as f:
        media = {row['mediaID']: row for row in csv.DictReader(f)}
    with open(obs_file, newline='') as f:
        observations = list(csv.DictReader(f))

    data = _base_output('camtrap-dp')
    classification_names = {}
    media_to_detections = {mid: [] for mid in media}

    for obs in observations:
        mid = obs.get('mediaID')
        if mid not in media_to_detections:
            continue
        obs_type = (obs.get('observationType') or '').lower()
        if obs_type in ('blank', 'empty', 'unknown', ''):
            continue
        if obs_type == 'human':
            category = '2'
        elif obs_type == 'vehicle':
            category = '3'
        else:
            category = '1'
        det = {'category': category,
               'conf': float(obs.get('classificationProbability')
                             or 1.0),
               'bbox': [
                   float(obs.get('bboxX') or 0),
                   float(obs.get('bboxY') or 0),
                   float(obs.get('bboxWidth') or 1),
                   float(obs.get('bboxHeight') or 1)]}
        name = obs.get('scientificName')
        if name:
            if name not in classification_names:
                classification_names[name] = str(
                    len(classification_names))
            det['classifications'] = [[classification_names[name],
                                       det['conf']]]
        media_to_detections[mid].append(det)

    for mid, m in media.items():
        fn = m.get('filePath') or m.get('fileName') or mid
        data['images'].append({'file': fn,
                               'detections': media_to_detections[mid]})

    if classification_names:
        data['classification_categories'] = {
            v: k for k, v in classification_names.items()}

    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data




def mewc_to_md(mewc_csv, output_file=None,
               category_name_column='class_id'):
    """
    Convert MEWC (Mega Efficient Wildlife Classifier) output CSV to MD
    format: rows carry filename, class, and probability; detections are
    full-frame animal boxes with the class attached as a classification.
    """

    with open(mewc_csv, newline='') as f:
        rows = list(csv.DictReader(f))

    data = _base_output('mewc')
    classification_names = {}
    fn_to_detections = {}

    for row in rows:
        fn = row.get('filename') or row.get('file') or row.get('image')
        if fn is None:
            continue
        fn_to_detections.setdefault(fn, [])
        label = row.get(category_name_column) or row.get('class')
        prob = float(row.get('prob') or row.get('probability') or
                     row.get('conf') or 1.0)
        if label is None or str(label).lower() in ('blank', 'empty'):
            continue
        label = str(label)
        if label not in classification_names:
            classification_names[label] = str(len(classification_names))
        fn_to_detections[fn].append({
            'category': '1',
            'conf': round(prob, 3),
            'bbox': [0.0, 0.0, 1.0, 1.0],
            'classifications': [[classification_names[label],
                                 round(prob, 4)]],
        })

    for fn, detections in fn_to_detections.items():
        data['images'].append({'file': fn, 'detections': detections})
    if classification_names:
        data['classification_categories'] = {
            v: k for k, v in classification_names.items()}

    if output_file is not None:
        ct_utils.write_json(output_file, data, force_str=True)
    return data


def main():
    parser = argparse.ArgumentParser(
        description='Convert third-party outputs to MD format')
    parser.add_argument('format', choices=['zamba', 'animl', 'camtrap_dp', 'mewc'])
    parser.add_argument('input_path')
    parser.add_argument('output_file')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    converter = {'zamba': zamba_to_md, 'animl': animl_to_md,
                 'camtrap_dp': camtrap_dp_to_md,
                 'mewc': mewc_to_md}[args.format]
    converter(args.input_path, args.output_file)


if __name__ == '__main__':
    main()
