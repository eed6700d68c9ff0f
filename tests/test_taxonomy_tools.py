"""
Taxonomy CSV checker, LILA category-mapping validation, and the
thumbnail-grid review renderer.
"""

import csv
import os

import numpy as np
from PIL import Image

from megadetector_tpu.taxonomy_mapping.taxonomy_csv_checker import (
    check_taxonomy_csv,
)
from megadetector_tpu.taxonomy_mapping.validate_lila_category_mappings import (
    load_taxonomy_queries,
    validate_category_mappings,
)
from megadetector_tpu.visualization.render_images_with_thumbnails import (
    render_images_with_thumbnails,
)


def _write_taxonomy_csv(path, rows):
    with open(path, 'w', newline='') as f:
        writer = csv.DictWriter(
            f, fieldnames=['dataset_name', 'query', 'taxonomy_level',
                           'scientific_name', 'taxonomy_string'])
        writer.writeheader()
        writer.writerows(rows)


def _row(ds, query, level, name, ancestry):
    return {'dataset_name': ds, 'query': query, 'taxonomy_level': level,
            'scientific_name': name,
            'taxonomy_string': repr(ancestry) if ancestry else ''}


GOOD_ANCESTRY = [
    (1, 'species', 'puma concolor', ['cougar']),
    (2, 'genus', 'puma', []),
    (3, 'family', 'felidae', []),
]


def test_checker_passes_consistent_rows(tmp_path):
    path = str(tmp_path / 'tax.csv')
    _write_taxonomy_csv(path, [
        _row('ds1', 'cougar', 'species', 'puma concolor', GOOD_ANCESTRY),
        _row('ds1', 'empty', '', '', None),
    ])
    result = check_taxonomy_csv(path, verbose=False)
    assert result['n_rows'] == 2
    assert result['taxon_level_errors'] == []
    assert result['scientific_name_errors'] == []
    assert result['ambiguous_parent_nodes'] == []
    assert not result['cycle']


def test_checker_flags_mismatches(tmp_path):
    path = str(tmp_path / 'tax.csv')
    _write_taxonomy_csv(path, [
        _row('ds1', 'cougar', 'genus', 'puma concolor', GOOD_ANCESTRY),
        _row('ds1', 'puma', 'species', 'felis concolor', GOOD_ANCESTRY),
    ])
    result = check_taxonomy_csv(path, verbose=False)
    assert len(result['taxon_level_errors']) == 1
    assert len(result['scientific_name_errors']) == 1


def test_checker_flags_ambiguous_parents(tmp_path):
    # 'x' claims two parents (p1, p2) that are not ancestors of each
    # other -> ambiguous; also check the resolved case (p2 under p1)
    path = str(tmp_path / 'tax.csv')
    _write_taxonomy_csv(path, [
        _row('d', 'a', 'genus', 'x',
             [(1, 'genus', 'x', []), (2, 'family', 'p1', [])]),
        _row('d', 'b', 'genus', 'x',
             [(1, 'genus', 'x', []), (3, 'family', 'p2', [])]),
    ])
    result = check_taxonomy_csv(path, verbose=False)
    assert result['ambiguous_parent_nodes'] == [('genus', 'x')]

    _write_taxonomy_csv(path, [
        _row('d', 'a', 'genus', 'x',
             [(1, 'genus', 'x', []), (2, 'family', 'p1', [])]),
        _row('d', 'b', 'genus', 'x',
             [(1, 'genus', 'x', []), (3, 'subfamily', 'p2', []),
              (2, 'family', 'p1', [])]),
    ])
    result = check_taxonomy_csv(path, verbose=False)
    assert result['ambiguous_parent_nodes'] == []


def test_validate_lila_category_mappings(tmp_path):
    path = str(tmp_path / 'tax.csv')
    _write_taxonomy_csv(path, [
        _row('ds1', 'cougar', 'species', 'puma concolor', GOOD_ANCESTRY),
        _row('ds1', 'mystery', '', '', None),
    ])
    queries = load_taxonomy_queries(path)
    dataset_to_categories = {
        'ds1': [{'name': 'Cougar'}, {'name': 'mystery'},
                {'name': 'unknown beast'}],
        'ds1_bbox': [{'name': 'cougar'}],
    }
    missing, unmapped = validate_category_mappings(
        dataset_to_categories, queries, verbose=False)
    assert missing == ['ds1:unknown beast']
    assert unmapped == ['ds1:mystery']


def test_render_images_with_thumbnails(tmp_path):
    rng = np.random.RandomState(0)
    primary = str(tmp_path / 'primary.jpg')
    Image.fromarray(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
                    ).save(primary)
    secondaries = []
    boxes = []
    for i in range(5):
        p = str(tmp_path / 'sec_{}.jpg'.format(i))
        Image.fromarray(rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
                        ).save(p)
        secondaries.append(p)
        boxes.append((0.25, 0.25, 0.2, 0.2))

    out_file = str(tmp_path / 'out' / 'review.jpg')
    render_images_with_thumbnails(primary, 300, secondaries, boxes, 200,
                                  out_file, primary_image_location='right')
    with Image.open(out_file) as im:
        w, h = im.size
    assert w == 300 + 200
    assert h == int(round(240 * 300 / 320))


WI_TAXONOMY = [
    'uuid1;mammalia;carnivora;felidae;puma;concolor;cougar',
    'uuid2;mammalia;carnivora;felidae;;;cat family',
    'uuid3;mammalia;rodentia;sciuridae;;;squirrel family',
    'uuid4;mammalia;;;;;mammal',
]


def test_map_lila_taxonomy_to_wi(tmp_path):
    from megadetector_tpu.taxonomy_mapping.map_lila_taxonomy_to_wi_taxonomy \
        import map_lila_taxonomy_to_wi

    lila_csv = str(tmp_path / 'lila.csv')
    _write_taxonomy_csv(lila_csv, [
        # exact species match
        _row('ds1', 'cougar', 'species', 'puma concolor', GOOD_ANCESTRY),
        # no WI entry at tribe level -> walks up to family
        _row('ds1', 'flying squirrel', 'tribe', 'pteromyini',
             [(1, 'tribe', 'pteromyini', []),
              (2, 'family', 'sciuridae', []),
              (3, 'order', 'rodentia', [])]),
        # supplementary override
        _row('ds1', 'weird', 'species', 'mysterius beastus',
             [(9, 'species', 'mysterius beastus', [])]),
        # unmappable
        _row('ds1', 'fog', '', '', None),
    ])
    rows = map_lila_taxonomy_to_wi(
        lila_csv, WI_TAXONOMY,
        supplementary_mapping={'mysterius beastus': 'mammalia'},
        output_file=str(tmp_path / 'out.csv'))

    by_query = {r['query']: r for r in rows}
    assert by_query['cougar']['mapping_method'] == 'exact'
    assert 'concolor' in by_query['cougar']['wi_prediction_string']
    assert by_query['flying squirrel']['mapping_method'] == \
        'ancestor:family'
    assert 'sciuridae' in \
        by_query['flying squirrel']['wi_prediction_string']
    assert by_query['weird']['mapping_method'] == 'supplementary'
    assert by_query['weird']['wi_prediction_string'].startswith('uuid4')
    assert by_query['fog']['mapping_method'] == 'unmapped'

    import csv as _csv
    with open(str(tmp_path / 'out.csv')) as f:
        written = list(_csv.DictReader(f))
    assert len(written) == 4
