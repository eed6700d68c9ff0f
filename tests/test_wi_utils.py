"""Tests for WI taxonomy-string utilities and prediction conversion."""

import pytest

from megadetector_tpu.utils.wi_utils import (
    ANIMAL_GUID, BLANK_GUID, HUMAN_GUID, build_taxonomy_string,
    is_animal_prediction, is_blank_prediction, is_human_prediction,
    parse_taxonomy_string, taxonomy_string_to_binomial_name,
    taxonomy_string_to_common_name, wi_predictions_to_md)


DEER = 'uuid-1;mammalia;cetartiodactyla;cervidae;odocoileus;' \
    'virginianus;white-tailed deer'


def test_taxonomy_string_round_trip():
    fields = parse_taxonomy_string(DEER)
    assert fields['family'] == 'cervidae'
    assert fields['common_name'] == 'white-tailed deer'
    rebuilt = build_taxonomy_string(
        fields['guid'], fields['class'], fields['order'],
        fields['family'], fields['genus'], fields['species'],
        fields['common_name'])
    assert rebuilt == DEER


def test_binomial_and_common_names():
    assert taxonomy_string_to_binomial_name(DEER) == \
        'Odocoileus virginianus'
    assert taxonomy_string_to_common_name(DEER) == 'white-tailed deer'


def test_prediction_type_checks():
    blank = BLANK_GUID + ';;;;;;blank'
    human = HUMAN_GUID + ';mammalia;primates;hominidae;homo;sapiens;human'
    animal = ANIMAL_GUID + ';;;;;;animal'
    assert is_blank_prediction(blank)
    assert not is_blank_prediction(DEER)
    assert is_human_prediction(human)
    assert not is_human_prediction(DEER)
    assert is_animal_prediction(DEER)
    assert is_animal_prediction(animal)
    assert not is_animal_prediction(human)
    assert not is_animal_prediction(blank)


def test_wi_predictions_to_md():
    predictions = {'predictions': [
        {'filepath': 'a.jpg', 'prediction': DEER,
         'prediction_score': 0.92,
         'detections': [{'label': 'animal', 'conf': 0.95,
                         'bbox': [0.1, 0.1, 0.3, 0.3]}]},
        {'filepath': 'b.jpg',
         'prediction': BLANK_GUID + ';;;;;;blank',
         'prediction_score': 0.9, 'detections': []},
        {'filepath': 'c.jpg', 'failures': ['DETECTOR']},
    ]}
    out = wi_predictions_to_md(predictions)
    by_file = {im['file']: im for im in out['images']}

    a = by_file['a.jpg']
    assert a['detections'][0]['category'] == '1'
    class_id, conf = a['detections'][0]['classifications'][0]
    assert out['classification_categories'][class_id] == \
        'white-tailed deer'
    assert conf == pytest.approx(0.92)

    assert by_file['b.jpg']['detections'] == []
    assert by_file['c.jpg']['detections'] is None
    assert 'DETECTOR' in by_file['c.jpg']['failure']
