"""
Tests for TaxonomyHandler geofencing: rule loading, allow/block
semantics (block-wins, allow-list-implies-block, USA state rules),
fix-row generation, and CSV export.
"""

import os

import pytest

from megadetector_tpu.utils.wi_taxonomy_utils import TaxonomyHandler


TAXONOMY_LINES = [
    '5c7ce479-8a45-40b3-ae21-7c97dfae22f5;mammalia;cetartiodactyla;'
    'cervidae;odocoileus;virginianus;white-tailed deer',
    'aaaaaaaa-0000-0000-0000-000000000001;mammalia;carnivora;felidae;'
    'puma;concolor;puma',
    'aaaaaaaa-0000-0000-0000-000000000002;mammalia;rodentia;;;;rodent',
    'aaaaaaaa-0000-0000-0000-000000000003;mammalia;carnivora;canidae;'
    'canis;lupus dingo;dingo',
]

DEER = 'mammalia;cetartiodactyla;cervidae;odocoileus;virginianus'
PUMA = 'mammalia;carnivora;felidae;puma;concolor'
DINGO = 'mammalia;carnivora;canidae;canis;lupus dingo'

GEOFENCE = {
    # Allow-list species: USA (some states) + CAN
    DEER: {'allow': {'USA': ['AL', 'AR', 'AZ'], 'CAN': []}},
    # Block-list species: blocked in AUS only
    PUMA: {'block': {'AUS': []}},
    # Country-wide USA block
    DINGO: {'allow': {'AUS': []}, 'block': {'USA': []}},
}

COUNTRY_CSV = (
    'name,alpha-2,alpha-3\n'
    'United States of America,US,USA\n'
    'Canada,CA,CAN\n'
    'Australia,AU,AUS\n'
    'Argentina,AR,ARG\n'
)


@pytest.fixture
def handler(tmp_path):
    import json
    geofence_file = str(tmp_path / 'geofence.json')
    with open(geofence_file, 'w') as f:
        json.dump(GEOFENCE, f)
    cc_file = str(tmp_path / 'codes.csv')
    with open(cc_file, 'w') as f:
        f.write(COUNTRY_CSV)
    return TaxonomyHandler(TAXONOMY_LINES, geofencing_file=geofence_file,
                           country_code_file=cc_file)


def test_taxonomy_info_lookup(handler):
    info = handler.species_string_to_taxonomy_info('puma')
    assert info['genus'] == 'puma' and info['species'] == 'concolor'
    info = handler.species_string_to_taxonomy_info('puma concolor')
    assert info['common_name'] == 'puma'
    # 7-token and 5-token input
    assert handler.species_string_to_canonical_species_string(
        TAXONOMY_LINES[1].split(';', 1)[0] + ';' + PUMA + ';puma') == \
        PUMA
    assert handler.species_string_to_canonical_species_string(PUMA) == \
        PUMA
    # Subspecies binomial keeps its space
    info = handler.species_string_to_taxonomy_info('canis lupus dingo')
    assert info['common_name'] == 'dingo'
    with pytest.raises(ValueError):
        handler.species_string_to_taxonomy_info('unobtainium')


def test_species_allowed_in_country(handler):
    # Allow-list: allowed in listed countries, blocked elsewhere
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'Canada')
    assert not handler.species_allowed_in_country(
        'white-tailed deer', 'AUS')
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'AUS', return_status=True) == \
        'block_not_on_country_allow_list'

    # Block-list: blocked only where listed
    assert not handler.species_allowed_in_country('puma', 'Australia')
    assert handler.species_allowed_in_country('puma', 'ARG')
    assert handler.species_allowed_in_country(
        'puma', 'ARG', return_status=True) == 'allow_not_on_block_list'

    # Un-geofenced species allowed everywhere
    assert handler.species_allowed_in_country('rodent', 'AUS')
    assert handler.species_allowed_in_country(
        'rodent', 'AUS', return_status=True) == 'allow_by_default'

    # Country name vs code equivalence
    assert handler.species_allowed_in_country(
        'puma', 'argentina') == handler.species_allowed_in_country(
        'puma', 'ARG')


def test_usa_state_rules(handler):
    # State on the allow list
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'USA', state='AL')
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'USA', state='AL',
        return_status=True) == 'allow_by_state'
    # State not on the allow list
    assert not handler.species_allowed_in_country(
        'white-tailed deer', 'USA', state='NY')
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'USA', state='NY',
        return_status=True) == 'block_other_states_allowed'
    # No state given with a state list: treated as country-wide allow
    assert handler.species_allowed_in_country(
        'white-tailed deer', 'USA')
    # Country-wide block wins for the dingo
    assert not handler.species_allowed_in_country(
        'dingo', 'USA', state='AL')
    assert handler.species_allowed_in_country(
        'dingo', 'USA', return_status=True) == 'block_usa_wide'


def test_generate_csv_rows(handler):
    rows = handler.generate_csv_rows_for_species(
        PUMA, allow_countries='arg, can', block_states=['NY'])
    assert rows == [
        PUMA + ',allow,ARG,',
        PUMA + ',allow,CAN,',
        PUMA + ',block,USA,NY',
    ]
    with pytest.raises(AssertionError):
        handler.generate_csv_rows_for_species('not a taxonomy string')


def test_block_all_countries_except(handler):
    # Deer allowed in USA + CAN; keep CAN, add ARG
    rows = handler.generate_csv_rows_to_block_all_countries_except(
        DEER, ['CAN', 'ARG'])
    assert DEER + ',block,USA,' in rows
    assert DEER + ',allow,ARG,' in rows
    assert not any(',block,CAN,' in r for r in rows)
    # Allowing an already-blocked country raises
    with pytest.raises(ValueError):
        handler.generate_csv_rows_to_block_all_countries_except(
            DINGO, ['USA'])


def test_export_geofence_csv(handler, tmp_path):
    csv_fn = str(tmp_path / 'geofence_export.csv')
    df = handler.export_geofence_data_to_csv(csv_fn)
    assert os.path.isfile(csv_fn)
    assert 'USA' in df.columns and 'USA:AL' in df.columns
    assert df.loc[DEER, 'USA:AL'] == 1
    assert df.loc[PUMA, 'CAN'] == 1
    import pandas as pd
    assert pd.isna(df.loc[DINGO, 'USA'])
    assert df.loc[DEER, 'common_name'] == 'white-tailed deer'


def test_find_taxa_allowed_in_region(handler):
    taxa = handler.find_taxa_allowed_in_region('CAN')
    assert DEER in taxa and PUMA in taxa and DINGO not in taxa
    taxa_usa_ny = handler.find_taxa_allowed_in_region('USA', state='NY')
    assert DEER not in taxa_usa_ny and PUMA in taxa_usa_ny


def test_generate_whole_image_detections(tmp_path):
    import json
    from megadetector_tpu.utils import wi_taxonomy_utils as w
    classes = [w.blank_prediction_string,
               TAXONOMY_LINES[1] + '']  # puma prediction string
    preds = {'predictions': [
        {'filepath': 'a.jpg',
         'classifications': {'classes': [TAXONOMY_LINES[1]],
                             'scores': [0.9]}},
        {'filepath': 'b.jpg',
         'classifications': {
             'classes': [w.blank_prediction_string,
                         w.human_prediction_string],
             'scores': [0.8, 0.6]}},
    ]}
    cls_file = str(tmp_path / 'cls.json')
    det_file = str(tmp_path / 'det.json')
    ens_file = str(tmp_path / 'ens.json')
    with open(cls_file, 'w') as f:
        json.dump(preds, f)
    w.generate_whole_image_detections_for_classifications(
        cls_file, det_file, ensemble_json_file=ens_file)
    with open(det_file) as f:
        d = json.load(f)
    assert len(d['predictions']) == 2
    det_a = d['predictions'][0]['detections'][0]
    assert det_a['label'] == 'animal' and det_a['category'] == '1'
    assert det_a['bbox'] == [0.0, 0.0, 1.0, 1.0]
    # Blank skipped in favor of the human classification
    det_b = d['predictions'][1]['detections'][0]
    assert det_b['label'] == 'human' and det_b['category'] == '2'
    with open(ens_file) as f:
        e = json.load(f)
    assert e['predictions'][1]['prediction'] == \
        w.human_prediction_string
    assert e['predictions'][1]['prediction_source'] == \
        'fake_ensemble_file_utility'


def test_geofence_adjustment_html_summary():
    from megadetector_tpu.utils import wi_taxonomy_utils as w
    pairs = {'puma,felidae': 20, 'deer,cervidae': 12, 'rare,thing': 2}
    html = w.generate_geofence_adjustment_html_summary(pairs,
                                                       min_count=10)
    assert 'puma &rarr; felidae (20)' in html
    assert 'deer &rarr; cervidae (12)' in html
    assert 'rare' not in html
    assert w.generate_geofence_adjustment_html_summary({}, 10) == ''
