"""
Reference exact-name parity: taxonomy tooling, RDE core classes,
diagnostics, and misc helpers (audited against
/root/reference/megadetector with an AST top-level-def sweep).
"""

import os

import numpy as np
import pytest

from megadetector_tpu.utils import ct_utils


# %% taxonomy_graph


def _taxonomy_rows():
    # Two dataset labels resolving into one small ancestry DAG
    return [
        {'dataset_name': 'DS1', 'query': 'Deer',
         'taxonomy_level': 'species',
         'scientific_name': 'odocoileus virginianus',
         'taxonomy_string':
             "[(1, 'species', 'odocoileus virginianus', "
             "('white-tailed deer',)), "
             "(2, 'genus', 'odocoileus', ()), "
             "(3, 'family', 'cervidae', ()), "
             "(4, 'order', 'artiodactyla', ())]"},
        {'dataset_name': 'ds2', 'query': 'mule deer',
         'taxonomy_level': 'species',
         'scientific_name': 'odocoileus hemionus',
         'taxonomy_string':
             "[(5, 'species', 'odocoileus hemionus', ()), "
             "(2, 'genus', 'odocoileus', ()), "
             "(3, 'family', 'cervidae', ()), "
             "(4, 'order', 'artiodactyla', ())]"},
        {'dataset_name': 'ds2', 'query': 'unknown thing',
         'taxonomy_level': 'species', 'scientific_name': 'x',
         'taxonomy_string': None},
    ]


def test_build_taxonomy_graph_and_dag_to_tree():
    import networkx as nx

    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import (
        TaxonNode, build_taxonomy_graph, dag_to_tree)

    graph, taxon_to_node, label_to_node = \
        build_taxonomy_graph(_taxonomy_rows())

    assert ('genus', 'odocoileus') in taxon_to_node
    genus = taxon_to_node[('genus', 'odocoileus')]
    assert len(genus.children) == 2
    assert genus.parents[0].name == 'cervidae'
    assert ('inat', 2) in genus.ids

    # Dataset labels land on the lowest taxon and roll up
    wtd = label_to_node[('ds1', 'deer')]
    assert wtd.name == 'odocoileus virginianus'
    assert wtd.dataset_labels == {('ds1', 'deer')}
    assert genus.get_dataset_labels() == \
        {('ds1', 'deer'), ('ds2', 'mule deer')}
    assert genus.get_dataset_labels(include_datasets=['ds2']) == \
        {('ds2', 'mule deer')}

    # Rows without a taxonomy_string are excluded
    assert ('ds2', 'unknown thing') not in label_to_node

    # LCA of the two species is the genus
    mule = label_to_node[('ds2', 'mule deer')]
    assert TaxonNode.lowest_common_ancestor([wtd, mule]) is genus

    tree = dag_to_tree(graph, taxon_to_node)
    for component in nx.weakly_connected_components(tree):
        assert nx.is_tree(tree.subgraph(component))
    # Nodes now point at the tree
    assert genus.graph is tree


def test_taxon_node_add_parent_semantics():
    import networkx as nx

    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
        TaxonNode

    g = nx.DiGraph()
    parent = TaxonNode('family', 'cervidae', graph=g)
    child = TaxonNode('genus', 'odocoileus', graph=g)
    child.add_parent(parent)
    assert child.parents == [parent]
    assert child.parent is parent
    assert parent.children == [child]

    # Nodes from different graphs can't be linked
    other = TaxonNode('order', 'artiodactyla')
    with pytest.raises(AssertionError):
        child.add_parent(other)

    # single_parent_only rejects a second distinct parent
    TaxonNode.single_parent_only = True
    try:
        parent2 = TaxonNode('family', 'bovidae', graph=g)
        with pytest.raises(AssertionError):
            child.add_parent(parent2)
    finally:
        TaxonNode.single_parent_only = False


# %% species_lookup


def _small_lookup():
    from megadetector_tpu.taxonomy_mapping.species_lookup import \
        SpeciesLookup

    rows = [
        ('4', 'order', 'artiodactyla', None),
        ('3', 'family', 'cervidae', '4'),
        ('2', 'genus', 'odocoileus', '3'),
        ('1', 'species', 'odocoileus virginianus', '2'),
    ]
    return SpeciesLookup(rows, synonyms={
        'white-tailed deer': 'odocoileus virginianus'})


def test_species_lookup_reference_names(capsys):
    from megadetector_tpu.taxonomy_mapping.species_lookup import (
        get_scientific_name_from_row, get_taxonomic_info, pop_levels,
        print_taxonomy_matches, slugify, taxonomy_row_to_string,
        traverse_taxonomy, validate_and_convert,
        get_preferred_taxonomic_match)

    row = {'canonicalName': 'odocoileus virginianus',
           'scientificName': 'odocoileus virginianus (zimmermann)',
           'taxonRank': 'species',
           'vernacularName': 'white-tailed deer'}
    assert get_scientific_name_from_row(row) == \
        'odocoileus virginianus'
    assert taxonomy_row_to_string(row) == \
        'species odocoileus virginianus (white-tailed deer)'
    row2 = {'canonicalName': '', 'scientificName': 'canis lupus',
            'taxonRank': 'species'}
    assert get_scientific_name_from_row(row2) == 'canis lupus'

    lookup = _small_lookup()
    lookups = {'inat': lookup}

    matches = get_taxonomic_info('white-tailed deer', lookups=lookups)
    assert len(matches) == 1
    m = matches[0]
    assert m['source'] == 'inat'
    assert m['taxonomy'][0][1:3] == ('species',
                                     'odocoileus virginianus')
    assert m['taxonomy'][-1][2] == 'artiodactyla'

    print_taxonomy_matches(matches, verbose=True)
    printed = capsys.readouterr().out
    assert 'odocoileus virginianus' in printed and '(inat)' in printed

    node = lookup.lookup('odocoileus')
    walked = traverse_taxonomy(node, lookup.taxonomy, 'inat',
                               'odocoileus')
    assert [t[2] for t in walked['taxonomy']] == \
        ['odocoileus', 'cervidae', 'artiodactyla']

    assert slugify("Odocoileus virginianus (Zimmermann)") == \
        'odocoileus-virginianus-zimmermann'
    assert slugify('über cool', allow_unicode=False) == \
        'uber-cool'

    assert validate_and_convert((np.int64(5), [1, 'x'])) == (5, [1, 'x'])
    with pytest.raises(TypeError):
        validate_and_convert({'a': 1})

    # pop_levels drops the lowest ancestry level
    m = get_preferred_taxonomic_match('white-tailed deer', lookup)
    assert m.scientific_name == 'odocoileus virginianus'
    assert m.taxonomic_level == 'species'
    popped = pop_levels(m, n_levels=1)
    assert popped.scientific_name == 'odocoileus'
    assert popped.taxonomic_level == 'genus'


# %% simple_image_download


def test_simple_image_downloader(tmp_path):
    from megadetector_tpu.taxonomy_mapping.simple_image_download import (
        Downloader, check_webpage)

    jpeg = b'\xff\xd8\xff\xe0' + b'0' * 100
    urls = {'http://x/deer1.jpg': jpeg,
            'http://x/deer2.jpg': b'<html>not an image</html>'}

    def search_fn(query, limit):
        return list(urls)

    def fetch_fn(url):
        return urls[url]

    assert check_webpage('http://x/deer1.jpg', fetch_fn=fetch_fn) == jpeg
    assert check_webpage('http://x/deer2.jpg',
                         fetch_fn=fetch_fn) is None

    d = Downloader(search_fn=search_fn, fetch_fn=fetch_fn)
    d.directory = str(tmp_path / 'imgs')
    found = d.search_urls('deer', limit=2)
    assert len(found) == 1  # the html hit is filtered
    assert len(d.cached_urls) == 1
    assert d.get_urls() == ['http://x/deer1.jpg']

    paths = d.download(download_cache=True)
    assert len(paths) == 1
    assert os.path.isfile(paths[0])
    assert paths[0].endswith('.jpeg')
    assert os.path.dirname(paths[0]).endswith('deer')

    d.flush_cache()
    assert d.cached_urls == {}


# %% ocr


def test_find_text_in_crops():
    from megadetector_tpu.data_management.ocr_tools import \
        find_text_in_crops

    # Info bar: solid dark strip at the bottom of the crop
    bar = np.full((20, 100, 3), 10, np.uint8)
    noise = np.random.RandomState(0).randint(0, 255, (20, 100, 3),
                                             dtype=np.uint8)

    calls = []

    def ocr_fn(arr):
        calls.append(arr.shape)
        return ' 2022-03-01 11:22:33 \n'

    out = find_text_in_crops({'top': noise, 'bottom': bar},
                             ocr_fn=ocr_fn)
    assert set(out) == {'top', 'bottom'}
    assert out['bottom']['text'] == '2022-03-01 11:22:33'
    assert out['bottom']['crop_to_solid_region_results'] is not None

    # List-of-dicts input shape works too
    out = find_text_in_crops([{'image': bar, 'location': 'bottom'}],
                             ocr_fn=ocr_fn)
    assert out['bottom']['text'] != ''
    assert out['top']['text'] == ''


# %% analyze_classification_results


def test_analysis_results_and_misprediction_pages(tmp_path):
    from megadetector_tpu.postprocessing.analyze_classification_results \
        import (AnalysisResults, ClassificationAnalysisOptions,
                analyze_classification_results,
                render_misprediction_pages)

    data = {
        'images': [
            {'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2],
                 'classifications': [['0', 0.9]]}]},
            {'file': 'b.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2],
                 'classifications': [['1', 0.9]]}]},
            {'file': 'c.jpg', 'detections': []},
        ],
        'classification_categories': {'0': 'deer', '1': 'fox'},
        'detection_categories': {'1': 'animal'},
        'info': {},
    }
    gt = {'a.jpg': 'deer', 'b.jpg': 'deer', 'c.jpg': 'empty'}

    options = ClassificationAnalysisOptions()
    options.md_results_file = data
    options.ground_truth = gt
    options.output_dir = str(tmp_path / 'analysis')

    results = analyze_classification_results(options)
    assert isinstance(results, AnalysisResults)
    # dict access still works
    assert results['n_images_evaluated'] == 3
    # Reference attribute surface
    per_cat = results.per_category_results
    assert per_cat['deer']['n_ground_truth'] == 2
    assert per_cat['deer']['f1'] > 0
    assert results.accuracy == results['accuracy']
    assert results.macro_f1 is not None
    assert results.micro_f1 == results.accuracy
    cm = results.confusion_matrix_array
    names = results.active_categories
    assert cm.shape == (len(names), len(names))
    assert cm.sum() == 3
    assert os.path.isfile(results.html_output_file)

    pages = render_misprediction_pages(options, [('deer', 'fox')])
    page = pages[('deer', 'fox')]
    assert os.path.isfile(page)
    assert 'b.jpg' in open(page).read()


# %% detection / RDE / diagnostics


def test_get_stats_for_category(tmp_path):
    from megadetector_tpu.detection.run_inference_with_yolo_val import \
        get_stats_for_category

    console = str(tmp_path / 'val.txt')
    with open(console, 'w') as f:
        f.write('   Class  Images  Labels   P   R  mAP50  mAP50-95\n')
        f.write('     all     100     250  0.9 0.8  0.85  0.6\n')
        f.write('  animal      90     200  0.92 0.81  0.86  0.61\n')

    stats = get_stats_for_category(console, 'all')
    assert stats == {'category': 'all', 'n_images': 100,
                     'n_labels': 250, 'P': 0.9, 'R': 0.8,
                     'mAP50': 0.85, 'mAP50-95': 0.6}
    stats = get_stats_for_category(console, 'animal')
    assert stats['n_images'] == 90
    assert get_stats_for_category(console, 'vehicle') is None


def test_rde_core_classes():
    from megadetector_tpu.postprocessing.repeat_detection_elimination.\
        repeat_detections_core import DetectionLocation, IndexedDetection

    candidate = {
        'bbox': [0.1, 0.1, 0.2, 0.2], 'category': '1',
        'relative_dir': 'cam1',
        'instances': [
            {'filename': 'cam1/a.jpg', 'i_detection': 0,
             'bbox': [0.1, 0.1, 0.2, 0.2], 'conf': 0.9},
            {'filename': 'cam1/b.jpg', 'i_detection': 1,
             'bbox': [0.11, 0.1, 0.2, 0.2], 'conf': 0.6},
        ]}
    loc = DetectionLocation.from_candidate_dict(candidate)
    assert loc.relativeDir == 'cam1'
    assert len(loc.instances) == 2
    assert isinstance(loc.instances[0], IndexedDetection)

    det = loc.to_api_detection()
    assert det == {'category': '1', 'conf': 0.9,
                   'bbox': [0.1, 0.1, 0.2, 0.2]}

    # Unsorted instances are rejected
    loc.instances = list(reversed(loc.instances))
    with pytest.raises(AssertionError):
        loc.to_api_detection()


def test_gpu_test_module():
    from megadetector_tpu.utils.gpu_test import (directml_test,
                                                 torch_test)

    # No CUDA/DirectML in this environment; both report 0 devices and
    # don't raise
    assert isinstance(torch_test(verbose=False), int)
    assert directml_test(verbose=False) == 0


def test_md_tests_reference_names(monkeypatch, tmp_path):
    from megadetector_tpu.utils import integration_tests as it

    fn = it.get_expected_results_filename(False, 'mdv5a', 'image')
    assert fn.startswith('mdv5a-image-cpu-jax')
    fn = it.get_expected_results_filename(True, 'mdv5a', 'image',
                                          augment=True)
    assert 'augment-' in fn and '-tpu-' in fn
    fn = it.get_expected_results_filename(False, 'mdv5a', 'video')
    assert fn == 'mdv5a-video.json'

    # run_download_tests reports per-model status without raising on
    # unreachable URLs
    from megadetector_tpu.models import registry

    def fake_download(name, force_download=False, verbose=False):
        raise OSError('no egress')

    monkeypatch.setattr(registry, 'try_download_known_detector',
                        fake_download)
    status = it.run_download_tests()
    assert len(status) > 0
    assert all(s.startswith('skipped') for s in status.values())


def test_azure_url_to_gcp_http_url():
    from megadetector_tpu.data_management.lila.lila_common import \
        azure_url_to_gcp_http_url

    url = ('https://lilawildlife.blob.core.windows.net/lila-wildlife/'
           'caltech/im1.jpg')
    assert azure_url_to_gcp_http_url(url) == \
        ('https://storage.googleapis.com/public-datasets-lila/'
         'lila-wildlife/caltech/im1.jpg')
    with pytest.raises(AssertionError):
        azure_url_to_gcp_http_url('https://example.com/x.jpg')
