"""
Reference exact-name parity, second round-3 batch: digiKam embedded-XMP
surface, node-based label-spec mapping, url_utils server/progress
classes, LILA subset row filters, detect_and_crop local toolchain,
run_classifier dataset/loader, evaluate_model check_override.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image


# %% helpers


def _write_image(path, w=64, h=48, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
        path)


def _results_file(tmp_path, images_dir, entries):
    data = {
        'info': {'format_version': '1.6', 'detector': 'md_v5a.0.0.pt'},
        'detection_categories': {'1': 'animal', '2': 'person',
                                 '3': 'vehicle'},
        'images': entries,
    }
    p = str(tmp_path / 'results.json')
    with open(p, 'w') as f:
        json.dump(data, f)
    return p


# %% xmp_integration reference surface


def test_xmp_process_input_data(tmp_path):
    from megadetector_tpu.integration.xmp_integration import (
        category_mapping, process_input_data, update_xmp_metadata,
        write_status, xmp_integration_options)

    images_dir = str(tmp_path / 'images')
    _write_image(os.path.join(images_dir, 'a.jpg'))
    _write_image(os.path.join(images_dir, 'b.jpg'))
    _write_image(os.path.join(images_dir, 'c.jpg'))

    entries = [
        {'file': 'prefix/a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            {'category': '2', 'conf': 0.1, 'bbox': [0.1, 0.1, 0.2, 0.2]},
        ]},
        # Above min_threshold but below rename_conf -> renamed to
        # b_check.jpg
        {'file': 'prefix/b.jpg', 'detections': [
            {'category': '1', 'conf': 0.3,
             'bbox': [0.1, 0.1, 0.2, 0.2]},
        ]},
        # No detections at all -> also renamed when a threshold is set
        {'file': 'prefix/c.jpg', 'detections': []},
    ]
    results = _results_file(tmp_path, images_dir, entries)

    options = xmp_integration_options()
    options.image_folder = images_dir
    options.input_file = results
    options.remove_path = 'prefix/'
    options.min_threshold = '0.2'
    options.rename_conf = '0.5'
    options.rename_cats = 'all'
    options.num_threads = 1
    process_input_data(options)

    # a.jpg: only the animal tag (person was below min_threshold);
    # written as a sidecar in this environment (no pyexiv2)
    sidecar = os.path.join(images_dir, 'a.xmp')
    assert os.path.isfile(sidecar)
    with open(sidecar) as f:
        content = f.read()
    assert 'Animal' in content and 'Human' not in content

    # a.jpg above rename_conf -> kept; b low conf and c empty -> renamed
    assert os.path.isfile(os.path.join(images_dir, 'a.jpg'))
    assert os.path.isfile(os.path.join(images_dir, 'b_check.jpg'))
    assert not os.path.isfile(os.path.join(images_dir, 'b.jpg'))
    assert os.path.isfile(os.path.join(images_dir, 'c_check.jpg'))

    # GUI-free write_status is a no-op
    write_status(options, 'hello')
    assert category_mapping['animal'] == 'Animal'

    # update_xmp_metadata never raises on missing files
    update_xmp_metadata({'1': 'animal'}, options, [], 1,
                        {'file': 'missing.jpg', 'detections': []})


# %% map_classification_categories node-based surface


def _node_fixture():
    import networkx as nx

    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
        TaxonNode

    g = nx.DiGraph()
    family = TaxonNode('family', 'cervidae', graph=g)
    genus = TaxonNode('genus', 'odocoileus', graph=g)
    species = TaxonNode('species', 'odocoileus virginianus', graph=g)
    other_family = TaxonNode('family', 'felidae', graph=g)
    genus.add_parent(family)
    species.add_parent(genus)
    taxon_to_node = {
        ('family', 'cervidae'): family,
        ('genus', 'odocoileus'): genus,
        ('species', 'odocoileus virginianus'): species,
        ('family', 'felidae'): other_family,
    }
    label_to_node = {
        ('ds1', 'deer'): genus,
        ('ds1', 'cat'): other_family,
    }
    return taxon_to_node, label_to_node, (family, genus, species,
                                          other_family)


def test_parse_spec_nodes():
    from megadetector_tpu.classification.map_classification_categories \
        import parse_spec

    taxon_to_node, label_to_node, (family, genus, species, other) = \
        _node_fixture()

    # A family spec includes its descendants
    got = parse_spec({'taxa': [{'level': 'Family', 'name': 'Cervidae'}]},
                     taxon_to_node, label_to_node)
    assert got == {family, genus, species}

    # Dataset labels resolve through label_to_node
    got = parse_spec({'dataset_labels': {'DS1': ['deer']}},
                     taxon_to_node, label_to_node)
    assert got == {genus, species}

    # exclude subtracts a nested spec
    got = parse_spec(
        {'taxa': [{'level': 'family', 'name': 'cervidae'}],
         'exclude': {'taxa': [
             {'level': 'species',
              'name': 'odocoileus virginianus'}]}},
        taxon_to_node, label_to_node)
    assert got == {family, genus}

    # Unknown taxa are skipped; empty result raises
    with pytest.raises(ValueError):
        parse_spec({'taxa': [{'level': 'family', 'name': 'nosuch'}]},
                   taxon_to_node, label_to_node)


def test_label_spec_to_nodes_and_target_mapping():
    from megadetector_tpu.classification.map_classification_categories \
        import label_spec_to_nodes, map_target_to_classifier

    taxon_to_node, label_to_node, (family, genus, species, other) = \
        _node_fixture()

    spec = {
        'deer': {'taxa': [{'level': 'family', 'name': 'cervidae'}]},
        'cat': {'taxa': [{'level': 'family', 'name': 'felidae'}]},
    }
    label_to_nodes = label_spec_to_nodes(spec, taxon_to_node,
                                         label_to_node)
    assert label_to_nodes['deer'] == {family, genus, species}
    assert label_to_nodes['cat'] == {other}

    # Overlapping label specs raise
    overlapping = {
        'deer': {'taxa': [{'level': 'family', 'name': 'cervidae'}]},
        'deer2': {'taxa': [{'level': 'genus', 'name': 'odocoileus'}]},
    }
    with pytest.raises(ValueError):
        label_spec_to_nodes(overlapping, taxon_to_node, label_to_node)

    # Classifier categories map onto containing targets; the unmatched
    # one lands in 'other'
    classifier = {
        'odocoileus': {genus, species},
        'felidae': {other},
    }
    target = {'deer': {family, genus, species}}
    mapping = map_target_to_classifier(target, classifier)
    assert mapping['deer'] == ['odocoileus']
    assert mapping['other'] == ['felidae']

    # Partial overlap is an error
    with pytest.raises(ValueError):
        map_target_to_classifier({'deer': {genus}},
                                 {'odocoileus': {genus, species}})


# %% url_utils classes


def test_singleton_http_server(tmp_path):
    import urllib.request

    from megadetector_tpu.utils.url_utils import (DownloadProgressBar,
                                                  SingletonHTTPServer)

    served = tmp_path / 'www'
    served.mkdir()
    (served / 'hello.txt').write_text('hi from the server')

    url = SingletonHTTPServer.start_server(str(served), port=18472)
    try:
        with urllib.request.urlopen(url + '/hello.txt', timeout=10) as r:
            assert r.read().decode() == 'hi from the server'
    finally:
        SingletonHTTPServer.stop_server()
    assert SingletonHTTPServer._server is None

    # Progress callback protocol: never raises, completes cleanly
    pbar = DownloadProgressBar()
    pbar(0, 1024, 4096)
    pbar(4, 1024, 4096)
    assert pbar.pbar is None


# %% download_lila_subset row filter


def test_find_items():
    import pandas as pd

    from megadetector_tpu.data_management.lila.download_lila_subset \
        import find_images_for_species, find_items

    df = pd.DataFrame([
        {'dataset_name': 'dsA', 'common_name': 'white-tailed deer',
         'url_gcp': 'gs://a/1.jpg', 'url_aws': 's3://a/1.jpg'},
        {'dataset_name': 'dsA', 'common_name': 'domestic cow',
         'url_gcp': 'gs://a/2.jpg', 'url_aws': 's3://a/2.jpg'},
        {'dataset_name': 'dsB', 'common_name': 'mule deer',
         'url_gcp': 'gs://b/3.jpg', 'url_aws': 's3://b/3.jpg'},
        {'dataset_name': 'dsB', 'common_name': None,
         'url_gcp': 'gs://b/4.jpg', 'url_aws': 's3://b/4.jpg'},
    ])

    ds_name_to_urls, counts = find_images_for_species(df, ['deer'])
    assert ds_name_to_urls == {'dsA': ['gs://a/1.jpg'],
                               'dsB': ['gs://b/3.jpg']}
    assert counts == {'deer': 2}

    # aws provider + manual accumulation through find_items
    acc = {}
    for _, row in df.iterrows():
        find_items(row, ['cow'], acc, preferred_provider='aws')
    assert acc == {'dsA': ['s3://a/2.jpg']}


# %% detect_and_crop local toolchain


def test_split_and_filter_detected_images(tmp_path):
    from megadetector_tpu.classification.detect_and_crop import (
        filter_detected_images, split_images_list_by_dataset)

    images = ['ds1/a.jpg', 'ds1/sub/b.jpg', 'ds2/c.jpg']
    assert split_images_list_by_dataset(images) == {
        'ds1': ['ds1/a.jpg', 'ds1/sub/b.jpg'], 'ds2': ['ds2/c.jpg']}

    cache_dir = tmp_path / 'cache'
    cache_dir.mkdir()
    with open(cache_dir / 'ds1.json', 'w') as f:
        json.dump({'images': [{'file': 'a.jpg', 'detections': []}],
                   'detection_categories': {'1': 'animal'}}, f)

    to_detect, cache, cats = filter_detected_images(images,
                                                    str(cache_dir))
    assert to_detect == ['ds1/sub/b.jpg', 'ds2/c.jpg']
    assert 'a.jpg' in cache['ds1'] and cache['ds2'] == {}
    assert cats == {'1': 'animal'}


def test_download_and_crop_local(tmp_path):
    from megadetector_tpu.classification.detect_and_crop import \
        download_and_crop

    images_dir = str(tmp_path / 'images')
    _write_image(os.path.join(images_dir, 'ds1', 'gt.jpg'), w=80, h=60)
    _write_image(os.path.join(images_dir, 'ds1', 'md.jpg'), w=80, h=60)

    queried = {
        # Ground-truth bboxes -> ___crop00.jpg naming
        'ds1/gt.jpg': {'dataset': 'ds1',
                       'bbox': [{'bbox': [0.1, 0.1, 0.5, 0.5]}]},
        # Cached MD detections -> ___crop00_mdv5.0.jpg naming
        'ds1/md.jpg': {'dataset': 'ds1'},
        # No cache entry -> failure
        'ds1/missing.jpg': {'dataset': 'ds1'},
    }
    detection_cache = {'ds1': {
        'md.jpg': {'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.2, 0.2, 0.4, 0.4]},
            {'category': '1', 'conf': 0.05,
             'bbox': [0.1, 0.1, 0.2, 0.2]},
        ]},
    }}

    crops_dir = str(tmp_path / 'crops')
    failed, n_downloads, n_crops = download_and_crop(
        queried, detection_cache, {'1': 'animal'}, '5.0', crops_dir,
        confidence_threshold=0.5, images_dir=images_dir)

    assert failed == ['ds1/missing.jpg']
    assert n_crops == 2
    assert os.path.isfile(
        os.path.join(crops_dir, 'ds1', 'gt___crop00.jpg'))
    assert os.path.isfile(
        os.path.join(crops_dir, 'ds1', 'md___crop00_mdv5.0.jpg'))


# %% run_classifier SimpleDataset / create_loader


def test_simple_dataset_and_loader(tmp_path):
    from megadetector_tpu.classification.run_classifier import (
        SimpleDataset, create_loader)

    crops_dir = str(tmp_path / 'crops')
    for i in range(3):
        _write_image(os.path.join(
            crops_dir, 'img_{}___crop00_mdv5.0.jpg'.format(i)),
            w=32 + i, h=24, seed=i)
    _write_image(os.path.join(crops_dir, 'not_a_crop.jpg'))

    ds = SimpleDataset(['img_0___crop00_mdv5.0.jpg'],
                       images_dir=crops_dir)
    img, img_file = ds[0]
    assert img_file == 'img_0___crop00_mdv5.0.jpg'
    assert img.size == (32, 24)
    assert len(ds) == 1

    # No detections file: every file in the folder
    batches = list(create_loader(crops_dir, None, img_size=16,
                                 batch_size=3))
    n_files = sum(len(files) for _, files in batches)
    assert n_files == 4
    assert batches[0][0].shape == (3, 16, 16, 3)
    assert batches[0][0].dtype == np.float32
    assert batches[0][0].max() <= 1.0

    # With a detections file: only crops of listed images
    results = str(tmp_path / 'results.json')
    with open(results, 'w') as f:
        json.dump({'images': [{'file': 'img_1.jpg'},
                              {'file': 'img_2.jpg'}]}, f)
    batches = list(create_loader(crops_dir, results, img_size=16,
                                 batch_size=8))
    files = [fn for _, fns in batches for fn in fns]
    assert files == ['img_1___crop00_mdv5.0.jpg',
                     'img_2___crop00_mdv5.0.jpg']


# %% evaluate_model check_override


def test_check_override():
    from megadetector_tpu.classification.evaluate_model import \
        check_override

    params = {'model_name': 'efficientnet-b3', 'img_size': 300}
    assert check_override(params, 'model_name', None) == \
        'efficientnet-b3'
    assert check_override(params, 'img_size', 224) == 224
    with pytest.raises(KeyError):
        check_override(params, 'nonexistent', None)


# %% misc: run_all_module_tests + CropBatch/CropMetadata


def test_misc_parity_names():
    from megadetector_tpu.detection.run_md_and_speciesnet import (
        CropBatch, CropMetadata)
    from megadetector_tpu.utils.ct_utils import run_all_module_tests

    assert callable(run_all_module_tests)

    batch = CropBatch()
    md = CropMetadata('a.jpg', 0, [0.1, 0.1, 0.2, 0.2], 640, 480)
    batch.add_crop(np.zeros((8, 8, 3)), md)
    assert len(batch) == 1
    assert batch.metadata[0].original_width == 640


# %% Regression tests for review findings


def test_get_stats_for_category_prefix_collision(tmp_path):
    from megadetector_tpu.detection.run_inference_with_yolo_val import \
        get_stats_for_category

    console = tmp_path / 'val.txt'
    console.write_text(
        'Class Images Labels P R mAP50 mAP50-95\n'
        'alligator 10 12 0.5 0.6 0.55 0.4\n'
        'all 30 40 0.7 0.8 0.75 0.6\n')
    stats = get_stats_for_category(str(console), 'all')
    assert stats['n_images'] == 30 and stats['mAP50'] == 0.75


def test_xmp_rename_without_min_threshold(tmp_path):
    from megadetector_tpu.integration.xmp_integration import (
        process_input_data, xmp_integration_options)

    images_dir = str(tmp_path / 'images')
    _write_image(os.path.join(images_dir, 'hi.jpg'))
    _write_image(os.path.join(images_dir, 'lo.jpg'))
    results = _results_file(tmp_path, images_dir, [
        {'file': 'hi.jpg', 'detections': [
            {'category': '1', 'conf': 0.99,
             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'lo.jpg', 'detections': [
            {'category': '1', 'conf': 0.2,
             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ])

    options = xmp_integration_options()
    options.image_folder = images_dir
    options.input_file = results
    options.rename_conf = '0.5'
    options.rename_cats = 'all'
    # No min_threshold: a confident image must NOT be renamed
    process_input_data(options)
    assert os.path.isfile(os.path.join(images_dir, 'hi.jpg'))
    assert os.path.isfile(os.path.join(images_dir, 'lo_check.jpg'))


def test_download_and_crop_contains_failures(tmp_path):
    from megadetector_tpu.classification.detect_and_crop import \
        download_and_crop

    images_dir = str(tmp_path / 'images')
    _write_image(os.path.join(images_dir, 'ds1', 'ok.jpg'))
    queried = {
        'ds1/ok.jpg': {'bbox': [{'bbox': [0.1, 0.1, 0.5, 0.5]}]},
        # Malformed record (bbox not a list) must fail only this image
        'ds1/bad.jpg': {'bbox': None},
    }
    failed, _, n_crops = download_and_crop(
        queried, {}, {}, '5.0', str(tmp_path / 'crops'),
        confidence_threshold=0.5, images_dir=images_dir)
    assert failed == ['ds1/bad.jpg']
    assert n_crops == 1


def test_trace_model_invalidates_stale_cache(tmp_path):
    import time

    from megadetector_tpu.classification.evaluate_model import \
        trace_model
    from megadetector_tpu.models import efficientnet
    from megadetector_tpu.models.convert_weights import save_checkpoint

    config = efficientnet.EfficientNetConfig('efficientnetv2_s',
                                             num_classes=2)
    params = efficientnet.init_params(config)
    ckpt = str(tmp_path / 'p.npz')
    save_checkpoint(params, ckpt, {'arch': 'efficientnetv2_s'})

    c1 = trace_model('efficientnetv2_s', ckpt, 2, 32)
    mtime1 = os.path.getmtime(c1)
    # Same request: reused
    assert trace_model('efficientnetv2_s', ckpt, 2, 32) == c1
    assert os.path.getmtime(c1) == mtime1
    # Different img_size: re-traced
    time.sleep(0.05)
    trace_model('efficientnetv2_s', ckpt, 2, 48)
    assert os.path.getmtime(c1) != mtime1
