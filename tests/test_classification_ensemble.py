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
    # Unknown species are allowed everywhere, and because nothing was
    # blocked, scores are NOT renormalized (top-k scores never sum to 1;
    # renormalizing without removal would inflate confidences).
    out = geofence_classifications({'moose': 0.9}, 'ZA/site2', table)
    assert out['moose'] == pytest.approx(0.9)
    # Nothing blocked at an allowed location: scores pass through exactly
    out = geofence_classifications(
        {'red fox': 0.5, 'bobcat': 0.2}, 'US/site3', table)
    assert out['red fox'] == pytest.approx(0.5)
    assert out['bobcat'] == pytest.approx(0.2)


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


def test_taxonomy_string_helpers():
    from megadetector_tpu.postprocessing.classification_ensemble import (
        is_taxonomy_string, parse_taxonomy_string,
        taxonomy_string_level, truncate_taxonomy_string)

    s = 'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox'
    assert is_taxonomy_string(s)
    assert not is_taxonomy_string('red fox')
    p = parse_taxonomy_string(s)
    assert p['family'] == 'canidae' and p['common_name'] == 'red fox'
    assert taxonomy_string_level(s) == 'species'
    assert taxonomy_string_level(';;;;;;blank') is None
    t = truncate_taxonomy_string(s, 'family')
    assert t == ';mammalia;carnivora;canidae;;;canidae'


def test_rollup_taxonomy_strings():
    from megadetector_tpu.postprocessing.classification_ensemble import \
        rollup_taxonomy_strings

    scores = {
        'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox': 0.4,
        'u2;mammalia;carnivora;canidae;urocyon;cinereoargenteus;'
        'gray fox': 0.35,
        'u3;mammalia;cetartiodactyla;cervidae;;;deer family': 0.25,
    }
    # Neither fox clears 0.65 alone, but canidae accumulates 0.75
    label, conf = rollup_taxonomy_strings(scores, 0.65)
    assert label == ';mammalia;carnivora;canidae;;;canidae'
    assert abs(conf - 0.75) < 1e-6
    # A confident top prediction is returned unchanged
    label, conf = rollup_taxonomy_strings(scores, 0.3)
    assert label.endswith('red fox')


def test_speciesnet_geofence_format():
    from megadetector_tpu.postprocessing.classification_ensemble import (
        geofence_allows, geofence_classifications)

    entry = {'allow': {'USA': [], 'CAN': ['BC']}}
    assert geofence_allows(entry, 'USA')
    assert geofence_allows(entry, 'USA/CA')
    assert geofence_allows(entry, 'CAN/BC')
    assert not geofence_allows(entry, 'CAN/ON')
    assert not geofence_allows(entry, 'MEX')

    blocked = {'block': {'USA': []}}
    assert not geofence_allows(blocked, 'USA')
    assert geofence_allows(blocked, 'CAN')

    table = {'moose': {'allow': {'CAN': []}}, 'cow': {}}
    scores = {'moose': 0.6, 'cow': 0.4}
    out = geofence_classifications(scores, 'MEX', table)
    assert out['moose'] == 0.0 and abs(out['cow'] - 1.0) < 1e-6
