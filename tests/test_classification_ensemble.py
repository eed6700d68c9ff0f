"""Tests for taxonomy rollup and geofencing."""

import pytest

from megadetector_tpu.postprocessing.classification_ensemble import (
    EnsembleOptions, apply_classification_ensemble,
    geofence_classifications, rollup_classifications)
from megadetector_tpu.taxonomy_mapping.taxonomy_graph import TaxonomyGraph


@pytest.fixture
def taxonomy():
    return TaxonomyGraph([
        ('1', 'class', 'mammalia', None),
        ('2', 'family', 'canidae', '1'),
        ('3', 'species', 'red fox', '2'),
        ('4', 'species', 'gray fox', '2'),
        ('5', 'family', 'felidae', '1'),
        ('6', 'species', 'bobcat', '5'),
    ])


def test_geofence():
    scores = {'red fox': 0.6, 'bobcat': 0.4}
    table = {'bobcat': ['US'], 'red fox': ['US', 'EU']}
    out = geofence_classifications(scores, 'EU/site1', table)
    assert out['bobcat'] == 0.0
    assert out['red fox'] == pytest.approx(1.0)
    # Unknown species are allowed everywhere
    out = geofence_classifications({'moose': 0.9}, 'ZA/site2', table)
    assert out['moose'] == pytest.approx(1.0)


def test_rollup_confident_prediction_unchanged(taxonomy):
    name, conf = rollup_classifications(
        {'red fox': 0.9, 'gray fox': 0.05}, taxonomy, 0.65)
    assert name == 'red fox'
    assert conf == pytest.approx(0.9)


def test_rollup_uncertain_species_to_family(taxonomy):
    # Split between two foxes: neither clears 0.65, their family does
    name, conf = rollup_classifications(
        {'red fox': 0.4, 'gray fox': 0.35, 'bobcat': 0.1},
        taxonomy, 0.65)
    assert name == 'canidae'
    assert conf == pytest.approx(0.75)


def test_rollup_to_class(taxonomy):
    name, conf = rollup_classifications(
        {'red fox': 0.3, 'bobcat': 0.3, 'gray fox': 0.2},
        taxonomy, 0.75)
    assert name == 'mammalia'
    assert conf == pytest.approx(0.8)


def test_apply_ensemble(taxonomy):
    data = {'images': [{'file': 'EU/cam1/a.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2],
         'classifications': [['0', 0.4], ['1', 0.35], ['2', 0.2]]}]}],
        'detection_categories': {'1': 'animal'},
        'classification_categories': {'0': 'red fox', '1': 'gray fox',
                                      '2': 'bobcat'},
        'info': {}}

    options = EnsembleOptions()
    options.geofence_table = {'bobcat': ['US']}
    out = apply_classification_ensemble(data, taxonomy, options=options)

    det = out['images'][0]['detections'][0]
    top_id, top_conf = det['classifications'][0]
    top_name = out['classification_categories'][top_id]
    # Bobcat geofenced away (EU), foxes renormalize to 0.5/0.44 and roll
    # up to canidae
    assert top_name == 'canidae'
    assert top_conf > 0.9
