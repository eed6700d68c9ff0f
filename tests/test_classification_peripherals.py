"""
Classification-toolchain peripherals (reference
megadetector/classification/: aggregate_classifier_probs,
map_classification_categories, identify_mislabeled_candidates,
analyze_failed_images, save_mislabeled, detect_and_crop).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image


def test_aggregate_classifier_probs(tmp_path):
    from megadetector_tpu.classification.aggregate_classifier_probs \
        import aggregate_classifier_probs

    csv_path = str(tmp_path / 'probs.csv')
    with open(csv_path, 'w') as f:
        f.write('path,deer,elk,wolf,coyote\n')
        f.write('a.jpg,0.5,0.3,0.1,0.1\n')
        f.write('b.jpg,0.1,0.1,0.4,0.4\n')
    mapping_path = str(tmp_path / 'mapping.json')
    with open(mapping_path, 'w') as f:
        json.dump({'cervid': ['deer', 'elk'],
                   'canid': ['wolf', 'coyote']}, f)

    out_csv = str(tmp_path / 'agg.csv')
    out_index = str(tmp_path / 'index.json')
    targets = aggregate_classifier_probs(csv_path, mapping_path,
                                         out_csv, out_index)
    assert targets == ['canid', 'cervid']
    lines = open(out_csv).read().splitlines()
    assert lines[0] == 'path,canid,cervid'
    assert lines[1].startswith('a.jpg,0.2') and '0.8' in lines[1]
    with open(out_index) as f:
        assert json.load(f) == {'0': 'canid', '1': 'cervid'}

    # Overlapping mapping is rejected
    with open(mapping_path, 'w') as f:
        json.dump({'cervid': ['deer', 'elk'], 'x': ['elk']}, f)
    with pytest.raises(AssertionError):
        aggregate_classifier_probs(csv_path, mapping_path, out_csv)


def test_map_classification_categories():
    from megadetector_tpu.classification.map_classification_categories \
        import map_classification_categories

    classifier_spec = {
        'deer': {'dataset_labels': {'ds1': ['deer']}},
        'elk': {'dataset_labels': {'ds1': ['elk']}},
        'wolf': {'dataset_labels': {'ds1': ['wolf']}},
    }
    desired_spec = {
        'cervid': {'dataset_labels': {'ds1': ['deer', 'elk']}},
    }
    mapping = map_classification_categories(desired_spec,
                                            classifier_spec)
    assert mapping == {'cervid': ['deer', 'elk'], 'other': ['wolf']}

    # Partial intersection errors out
    bad_desired = {
        'weird': {'dataset_labels': {'ds1': ['deer', 'bear']}},
        'deerish': {'dataset_labels': {'ds1': ['deer']}},
    }
    classifier_spec2 = {
        'cervids': {'dataset_labels': {'ds1': ['deer', 'elk']}},
    }
    with pytest.raises(ValueError):
        map_classification_categories(bad_desired, classifier_spec2)


def test_identify_mislabeled_candidates(tmp_path):
    from megadetector_tpu.classification \
        .identify_mislabeled_candidates import \
        identify_mislabeled_candidates

    csv_path = str(tmp_path / 'outputs_val.csv')
    with open(csv_path, 'w') as f:
        f.write('path,label,weight,deer,bear\n')
        # confidently wrong (margin 0.8)
        f.write('ds1/a.jpg___crop00.jpg,deer,1.0,0.1,0.9\n')
        # wrong but not confidently (margin 0.2)
        f.write('ds1/b.jpg___crop00.jpg,deer,1.0,0.4,0.6\n')
        # correct
        f.write('ds2/c.jpg___crop00.jpg,bear,1.0,0.2,0.8\n')

    logdir = str(tmp_path / 'log')
    out = identify_mislabeled_candidates(csv_path, 'val', logdir,
                                         margin=0.5)
    assert list(out.keys()) == ['ds1']
    assert len(out['ds1']) == 1
    txt = os.path.join(logdir, 'mislabeled_candidates_val_ds1.txt')
    assert open(txt).read().strip() == 'a.jpg___crop00.jpg'

    out = identify_mislabeled_candidates(
        csv_path, 'val', logdir, margin=0.1,
        include_dataset_in_filename=True)
    assert sorted(out['ds1']) == ['ds1/a.jpg___crop00.jpg',
                                  'ds1/b.jpg___crop00.jpg']


def test_analyze_failed_images(tmp_path):
    from megadetector_tpu.classification.analyze_failed_images import \
        analyze_failed_images

    good = tmp_path / 'good.jpg'
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(str(good))
    empty = tmp_path / 'empty.jpg'
    empty.write_bytes(b'')
    garbage = tmp_path / 'garbage.jpg'
    garbage.write_bytes(b'not an image at all')
    truncated = tmp_path / 'trunc.jpg'
    truncated.write_bytes(good.read_bytes()[:40])

    report = analyze_failed_images(
        ['good.jpg', 'empty.jpg', 'garbage.jpg', 'trunc.jpg',
         'missing.jpg'],
        images_dir=str(tmp_path),
        output_json=str(tmp_path / 'report.json'))
    by = report['by_status']
    assert [e['file'] for e in by['ok']] == ['good.jpg']
    assert [e['file'] for e in by['empty']] == ['empty.jpg']
    assert [e['file'] for e in by['missing']] == ['missing.jpg']
    bad = {e['file'] for k in ('undecodable', 'truncated')
           for e in by.get(k, [])}
    assert bad == {'garbage.jpg', 'trunc.jpg'}
    assert os.path.isfile(str(tmp_path / 'report.json'))


def test_save_mislabeled_ledger(tmp_path):
    from megadetector_tpu.classification.save_mislabeled import (
        filter_queried_images, read_ledger, save_mislabeled)

    ledger_path = str(tmp_path / 'ledger.csv')
    save_mislabeled(ledger_path, [
        {'dataset': 'ds1', 'file': 'ds1/a.jpg',
         'original_label': 'deer', 'corrected_label': 'bear'},
        {'dataset': 'ds1', 'file': 'ds1/b.jpg'},
    ])
    # Re-adding the same file replaces the entry
    save_mislabeled(ledger_path, [
        {'dataset': 'ds1', 'file': 'ds1/a.jpg',
         'corrected_label': 'wolf'}])
    ledger = read_ledger(ledger_path)
    assert len(ledger) == 2
    assert ledger[('ds1', 'ds1/a.jpg')]['corrected_label'] == 'wolf'

    queried_path = str(tmp_path / 'queried.json')
    with open(queried_path, 'w') as f:
        json.dump({'ds1/a.jpg': {'dataset': 'ds1', 'class': 'deer'},
                   'ds1/c.jpg': {'dataset': 'ds1', 'class': 'deer'}},
                  f)
    kept = filter_queried_images(queried_path, ledger_path,
                                 str(tmp_path / 'filtered.json'))
    assert list(kept.keys()) == ['ds1/c.jpg']


def test_detect_and_crop_with_cached_detections(tmp_path):
    """detect_and_crop reuses an existing detections file (the
    reference's detection cache) and produces crops."""

    from megadetector_tpu.classification.detect_and_crop import \
        detect_and_crop
    from megadetector_tpu.utils import ct_utils

    images_dir = tmp_path / 'images'
    images_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (60, 80, 3), np.uint8)).save(
        str(images_dir / 'x.jpg'))

    det_path = str(tmp_path / 'detections.json')
    ct_utils.write_json(det_path, {
        'images': [{'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9,
             'bbox': [0.1, 0.1, 0.5, 0.5]}]}],
        'detection_categories': {'1': 'animal'},
        'info': {'format_version': '1.6',
                 'detector': 'md_v5a.0.0.pt'}})

    crops_dir = str(tmp_path / 'crops')
    out_path, n_crops, failed = detect_and_crop(
        'unused-model', str(images_dir), crops_dir,
        detections_json_path=det_path, threshold=0.5)
    assert out_path == det_path
    assert n_crops == 1 and failed == []
    assert any('___crop00' in f for f in os.listdir(crops_dir))
