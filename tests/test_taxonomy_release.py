"""
Taxonomy preview / release tooling (round-2 verdict item 9; reference
taxonomy_mapping/preview_lila_taxonomy.py,
prepare_lila_taxonomy_release.py, map_new_lila_datasets.py).
"""

import csv
import os

import pytest

from megadetector_tpu.taxonomy_mapping.taxonomy_release import (
    RELEASE_LEVELS, check_taxonomy_consistency, map_new_dataset,
    parse_taxonomy_string, prepare_taxonomy_release,
    preview_lila_taxonomy, read_taxonomy_csv,
    taxonomy_string_to_common_name, taxonomy_string_to_level,
    taxonomy_string_to_scientific, write_taxonomy_csv)

TS_DEER = ("[(1, 'species', 'odocoileus virginianus', "
           "['white-tailed deer']), "
           "(2, 'genus', 'odocoileus', []), "
           "(3, 'family', 'cervidae', ['deer'])]")
TS_BEAR = ("[(4, 'species', 'ursus americanus', "
           "['american black bear']), "
           "(5, 'family', 'ursidae', ['bears'])]")


def _rows():
    return [
        {'dataset_name': 'ds1', 'query': 'deer',
         'taxonomy_level': 'species',
         'scientific_name': 'odocoileus virginianus',
         'common_name': 'white-tailed deer',
         'taxonomy_string': TS_DEER, 'source': 'manual'},
        {'dataset_name': 'ds1', 'query': 'bear',
         'taxonomy_level': 'species',
         'scientific_name': 'ursus americanus',
         'common_name': '',
         'taxonomy_string': TS_BEAR, 'source': 'manual'},
        {'dataset_name': 'ds2', 'query': 'empty',
         'taxonomy_level': '', 'scientific_name': '',
         'common_name': '', 'taxonomy_string': '', 'source': 'manual'},
        # Same query as ds1's deer but mapped to a different taxon
        {'dataset_name': 'ds2', 'query': 'deer',
         'taxonomy_level': 'family', 'scientific_name': 'cervidae',
         'common_name': 'deer',
         'taxonomy_string': "[(3, 'family', 'cervidae', ['deer'])]",
         'source': 'manual'},
    ]


def test_taxonomy_string_helpers():
    assert taxonomy_string_to_scientific(TS_DEER) == \
        'odocoileus virginianus'
    assert taxonomy_string_to_level(TS_DEER) == 'species'
    assert taxonomy_string_to_common_name(TS_DEER) == \
        'white-tailed deer'
    assert parse_taxonomy_string('') == []
    assert taxonomy_string_to_scientific('') == ''


def test_consistency_checks():
    rows = _rows()
    issues = check_taxonomy_consistency(rows)
    assert issues['null_mappings'] == ['ds2:empty']
    assert issues['missing_common_names'] == ['ds1:bear']
    assert len(issues['cross_dataset_inconsistencies']) == 1
    assert 'deer' in issues['cross_dataset_inconsistencies'][0]
    assert issues['scientific_name_mismatches'] == []

    bad = dict(rows[0], scientific_name='wrong name')
    issues = check_taxonomy_consistency([bad])
    assert len(issues['scientific_name_mismatches']) == 1


def test_preview_html(tmp_path):
    csv_path = str(tmp_path / 'taxonomy.csv')
    write_taxonomy_csv(_rows(), csv_path)
    out = preview_lila_taxonomy(csv_path, str(tmp_path / 'preview'))
    html = open(out).read()
    assert 'odocoileus virginianus' in html
    assert 'null mappings' in html
    assert 'cervidae (family)' in html  # chain rendering


def test_release_preparation(tmp_path):
    csv_path = str(tmp_path / 'taxonomy.csv')
    write_taxonomy_csv(_rows(), csv_path)

    # ds2:deer is unused by any dataset category list -> dropped
    ds_to_cats = {'ds1': [{'name': 'deer'}, {'name': 'bear'}],
                  'ds2': [{'name': 'empty'}]}
    import json
    cats_path = str(tmp_path / 'cats.json')
    with open(cats_path, 'w') as f:
        json.dump(ds_to_cats, f)

    release_path = str(tmp_path / 'release.csv')
    rows = prepare_taxonomy_release(csv_path, release_path,
                                    dataset_to_categories_json=cats_path)
    assert len(rows) == 3  # ds2:deer dropped
    with open(release_path, newline='') as f:
        released = list(csv.DictReader(f))
    assert all('source' not in r for r in released)
    deer = [r for r in released if r['query'] == 'deer'][0]
    assert deer['species'] == 'odocoileus virginianus'
    assert deer['genus'] == 'odocoileus'
    assert deer['family'] == 'cervidae'
    assert deer['kingdom'] == ''
    for level in RELEASE_LEVELS:
        assert level in released[0]

    # Refusing to overwrite an existing release file
    with pytest.raises(ValueError):
        prepare_taxonomy_release(csv_path, release_path)


def test_map_new_dataset(tmp_path):
    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
        TaxonomyGraph
    from megadetector_tpu.taxonomy_mapping.species_lookup import \
        SpeciesLookup

    taxonomy = TaxonomyGraph()
    taxonomy.add_node('1', 'family', 'cervidae')
    taxonomy.add_node('2', 'genus', 'odocoileus', parent_id='1')
    taxonomy.add_node('3', 'species', 'odocoileus virginianus',
                      parent_id='2')
    taxonomy.link()
    lookup = SpeciesLookup(
        taxonomy,
        synonyms={'white-tailed deer': 'odocoileus virginianus'})

    out_csv = str(tmp_path / 'new_mapping.csv')
    rows = map_new_dataset(
        'newds', ['White-tailed Deer', 'mystery animal'], lookup,
        output_csv=out_csv)
    assert rows[0]['scientific_name'] == 'odocoileus virginianus'
    assert rows[0]['taxonomy_level'] == 'species'
    assert 'cervidae' in rows[0]['taxonomy_string']
    assert rows[1]['source'] == 'unmapped'
    assert rows[1]['scientific_name'] == ''
    back = read_taxonomy_csv(out_csv)
    assert len(back) == 2


def test_retrieve_sample_image_injectable(tmp_path):
    """The sample-image retriever works offline through injected
    search/fetch transports (egress-free test of the full flow)."""

    from megadetector_tpu.taxonomy_mapping.retrieve_sample_image import \
        download_images

    def fake_search(query, limit):
        assert query == 'white-tailed+deer'
        return ['http://x/a.jpg', 'http://x/b.png', 'http://x/bad.jpg']

    def fake_fetch(url):
        if 'bad' in url:
            raise IOError('boom')
        return b'IMAGEDATA' + url.encode()

    out_dir = str(tmp_path / 'samples')
    paths = download_images('white-tailed deer', out_dir, limit=3,
                            search_fn=fake_search, fetch_fn=fake_fetch)
    assert len(paths) == 2
    assert paths[0].endswith('.jpg') and paths[1].endswith('.png')
    assert open(paths[0], 'rb').read().startswith(b'IMAGEDATA')
