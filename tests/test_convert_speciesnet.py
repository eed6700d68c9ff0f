"""
SpeciesNet release-bundle converter (models/convert_speciesnet.py) —
the day-one gate for real weights, exercised here against a synthetic
bundle with the release layout (weights .pt + labels.txt +
taxonomy_release.txt + geofence_base.json), end to end into
SpeciesClassifier and the ensemble stage.
"""

import json
import os

import numpy as np
import pytest

from megadetector_tpu.models import convert_speciesnet as cs

LABELS = [
    'aaaa0001-0000-0000-0000-000000000001;mammalia;rodentia;muridae;'
    'mus;musculus;house mouse',
    'aaaa0001-0000-0000-0000-000000000002;mammalia;carnivora;felidae;'
    'lynx;rufus;bobcat',
    'aaaa0001-0000-0000-0000-000000000003;aves;;;;;bird',
    'f1856211-cfb7-4a5b-9158-c0f72fd09ee6;;;;;;blank',
]


@pytest.fixture(scope='module')
def bundle(tmp_path_factory):
    import torch
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_effnet_ref import make_torch_effnet

    folder = tmp_path_factory.mktemp('sn_bundle')
    model = make_torch_effnet('efficientnetv2_test',
                              num_classes=len(LABELS), seed=0)
    torch.save({'state_dict': model.state_dict()},
               str(folder / 'always_crop_v4.pt'))
    (folder / 'labels.txt').write_text('\n'.join(LABELS) + '\n')
    (folder / 'taxonomy_release.txt').write_text(
        '\n'.join(LABELS) + '\n')
    geofence = {LABELS[1]: {'allow': {'USA': []}}}
    (folder / 'geofence_base.json').write_text(json.dumps(geofence))
    return str(folder)


def test_find_bundle_files(bundle):
    files = cs.find_bundle_files(bundle)
    assert files['weights'].endswith('always_crop_v4.pt')
    assert files['labels'].endswith('labels.txt')
    assert files['taxonomy'].endswith('taxonomy_release.txt')
    assert files['geofence'].endswith('geofence_base.json')


def test_dry_run_validates_without_torch(bundle):
    report = cs.convert_speciesnet_bundle(bundle, None, dry_run=True,
                                          verbose=False)
    assert report['dry_run'] and report['num_classes'] == len(LABELS)


def test_dry_run_rejects_bad_labels(tmp_path):
    (tmp_path / 'labels.txt').write_text('not-a-taxonomy-string\n')
    (tmp_path / 'model.pt').write_bytes(b'x')
    with pytest.raises(ValueError, match='taxonomy'):
        cs.convert_speciesnet_bundle(str(tmp_path), None, dry_run=True,
                                     verbose=False)


def test_missing_labels_rejected(tmp_path):
    (tmp_path / 'model.pt').write_bytes(b'x')
    with pytest.raises(ValueError, match='labels'):
        cs.convert_speciesnet_bundle(str(tmp_path), None, dry_run=True,
                                     verbose=False)


def test_convert_and_classify(bundle, tmp_path):
    out_dir = str(tmp_path / 'out')
    report = cs.convert_speciesnet_bundle(
        bundle, out_dir, arch='efficientnetv2_test', image_size=64,
        verbose=False)
    assert os.path.isfile(report['classifier'])
    assert os.path.isfile(report['taxonomy'])
    assert os.path.isfile(report['geofence'])
    assert os.path.isfile(os.path.join(out_dir, 'conversion.json'))

    # Converted artifact must match the torch forward
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch
    from torch_effnet_ref import make_torch_effnet
    import jax.numpy as jnp
    from megadetector_tpu.models import efficientnet as effnet
    from megadetector_tpu.models.convert_weights import load_checkpoint

    params, metadata = load_checkpoint(report['classifier'])
    assert metadata['class_names'] == LABELS
    assert metadata['model_type'] == 'speciesnet'
    assert metadata['crop_mode'] == 'stretch'

    cfg = effnet.EfficientNetConfig('efficientnetv2_test',
                                    num_classes=len(LABELS))
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(effnet.apply(cfg, params, jnp.asarray(x)))

    tm = make_torch_effnet('efficientnetv2_test',
                           num_classes=len(LABELS), seed=0)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    # And load through the SpeciesClassifier protocol
    from megadetector_tpu.models.classifier import SpeciesClassifier
    clf = SpeciesClassifier(report['classifier'], {'image_size': 64})
    assert clf.class_names == LABELS
    crops = [rng.randint(0, 255, (80, 60, 3), dtype=np.uint8)]
    probs = clf.classify_batch(crops)
    assert probs.shape == (1, len(LABELS))
    assert np.isclose(np.sum(probs[0]), 1.0, atol=1e-3)
    top = clf.top_k(probs[0], k=2)
    assert len(top) == 2 and float(top[0][1]) >= float(top[1][1])
