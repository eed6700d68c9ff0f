"""Tests for classifier training, md_to_wi, and taxonomy graph."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def test_train_step_reduces_loss():
    import jax
    import jax.numpy as jnp
    import optax
    from megadetector_tpu.models import efficientnet
    from megadetector_tpu.training.train_classifier import make_train_step

    # Tiny variant: this test validates the training machinery, not
    # the architecture (covered by tests/test_efficientnet.py)
    config = efficientnet.EfficientNetConfig('efficientnetv2_test',
                                             num_classes=3,
                                             image_size=32)
    params = jax.tree_util.tree_map(
        jnp.asarray, efficientnet.init_params(config, seed=0,
                                              train_init=True))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(3e-4))
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(config, optimizer))

    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    labels = rng.randint(0, 3, (8,)).astype(np.int32)

    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, images,
                                          labels)
        losses.append(float(metrics['loss']))
    # Overfitting a fixed batch: loss must make progress from the ln(3)
    # start (the norm-free net can oscillate late in the run, so check
    # the best loss, not the last)
    assert min(losses[1:]) < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_sharded_train_step():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from megadetector_tpu.models import efficientnet
    from megadetector_tpu.training.train_classifier import \
        make_sharded_train_step

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ('data',))
    # Tiny variant: this test validates the training machinery, not
    # the architecture (covered by tests/test_efficientnet.py)
    config = efficientnet.EfficientNetConfig('efficientnetv2_test',
                                             num_classes=3,
                                             image_size=32)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    params = jax.device_put(jax.tree_util.tree_map(
        jnp.asarray, efficientnet.init_params(config, seed=0,
                                              train_init=True)),
        replicated)
    optimizer = optax.adam(1e-3)
    opt_state = jax.device_put(optimizer.init(params), replicated)
    step = make_sharded_train_step(config, optimizer, mesh)

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 255, (16, 32, 32, 3)).astype(np.uint8), data)
    labels = jax.device_put(
        rng.randint(0, 3, (16,)).astype(np.int32), data)
    params, opt_state, metrics = step(params, opt_state, images, labels)
    assert np.isfinite(float(metrics['loss']))


def test_folder_dataset_and_train(tmp_path):
    from megadetector_tpu.training.train_classifier import (
        FolderDataset, TrainingOptions, train)

    # Tiny folder-per-class dataset
    rng = np.random.RandomState(0)
    for cls in ('deer', 'fox'):
        folder = os.path.join(str(tmp_path / 'crops'), cls)
        os.makedirs(folder)
        base = 60 if cls == 'deer' else 180
        for i in range(6):
            arr = np.full((40, 40, 3), base, np.uint8) + \
                rng.randint(0, 20, (40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(folder, '{}.jpg'.format(i)))

    ds = FolderDataset(str(tmp_path / 'crops'), image_size=32)
    assert ds.class_names == ['deer', 'fox']
    assert len(ds) == 12
    batches = list(ds.batches(4))
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 32, 32, 3)

    options = TrainingOptions()
    options.arch = 'efficientnetv2_test'
    options.image_size = 32
    options.batch_size = 4
    options.num_epochs = 1
    options.log_every = 1
    ckpt = str(tmp_path / 'clf.npz')
    params, history = train(str(tmp_path / 'crops'), ckpt, options)
    assert os.path.isfile(ckpt)

    # The checkpoint loads into the serving classifier
    from megadetector_tpu.models.classifier import SpeciesClassifier
    classifier = SpeciesClassifier(ckpt)
    assert classifier.class_names == ['deer', 'fox']
    probs = classifier.classify_batch(
        [rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)])
    assert probs.shape == (1, 2)


def test_md_to_wi(tmp_path):
    from megadetector_tpu.postprocessing.md_to_wi import (
        md_to_wi, BLANK_PREDICTION, HUMAN_PREDICTION)

    data = {'images': [
        {'file': 'empty.jpg', 'detections': []},
        {'file': 'person.jpg', 'detections': [
            {'category': '2', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'deer.jpg', 'detections': [
            {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['0', 0.95]]}]},
        {'file': 'broken.jpg', 'detections': None, 'failure': 'oops'},
    ], 'detection_categories': {'1': 'animal', '2': 'person',
                                '3': 'vehicle'},
        'classification_categories': {'0': 'deer'},
        'info': {}}
    input_file = str(tmp_path / 'md.json')
    ct_utils.write_json(input_file, data)

    out = md_to_wi(input_file, classification_name_to_wi_taxonomy={
        'deer': 'uuid;mammalia;cetartiodactyla;cervidae;;;deer'})
    by_file = {p['filepath']: p for p in out['predictions']}
    assert by_file['empty.jpg']['prediction'] == BLANK_PREDICTION
    assert by_file['person.jpg']['prediction'] == HUMAN_PREDICTION
    assert 'cervidae' in by_file['deer.jpg']['prediction']
    assert by_file['deer.jpg']['prediction_score'] == 0.95
    assert by_file['broken.jpg']['prediction'] == BLANK_PREDICTION
    assert 'failures' in by_file['broken.jpg']


def test_taxonomy_graph(tmp_path):
    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
        TaxonomyGraph

    rows = [
        ('1', 'class', 'mammalia', None),
        ('2', 'order', 'carnivora', '1'),
        ('3', 'family', 'canidae', '2'),
        ('4', 'species', 'red fox', '3'),
        ('5', 'family', 'felidae', '2'),
        ('6', 'species', 'bobcat', '5'),
    ]
    g = TaxonomyGraph(rows)

    fox = g.find('red fox')[0]
    assert [a.name for a in g.ancestors(fox)] == \
        ['canidae', 'carnivora', 'mammalia']
    mammalia = g.find('mammalia')[0]
    assert len(g.descendants(mammalia)) == 5
    bobcat = g.find('bobcat')[0]
    lca = g.lowest_common_ancestor(fox, bobcat)
    assert lca.name == 'carnivora'

    assert g.map_to_allowed('red fox', ['canidae']) == 'canidae'
    assert g.map_to_allowed('red fox', ['red fox']) == 'red fox'
    assert g.map_to_allowed('bobcat', ['canidae']) is None

    chains_file = str(tmp_path / 'chains.json')
    chains = g.to_parent_chain_file(chains_file)
    assert chains['red fox'] == ['canidae', 'carnivora', 'mammalia']
    assert os.path.isfile(chains_file)


def test_preferred_taxonomic_match(tmp_path):
    """Reference-style retry heuristics + GBIF backbone loading
    (reference species_lookup.py:715-800,77)."""

    from megadetector_tpu.taxonomy_mapping.species_lookup import (
        SpeciesLookup, clean_species_query,
        get_preferred_taxonomic_match, load_gbif_backbone)
    from megadetector_tpu.taxonomy_mapping.taxonomy_graph import \
        TaxonomyGraph

    taxonomy = TaxonomyGraph([
        ('1', 'class', 'mammalia', None),
        ('2', 'family', 'canidae', '1'),
        ('3', 'species', 'black-backed jackal', '2'),
        ('4', 'genus', 'sciurus', '1'),
    ])
    lookup = SpeciesLookup(taxonomy, synonyms={'squirrel': 'sciurus'})

    assert clean_species_query('Unknown Squirrel sp') == 'squirrel'

    # Hyphenation retry
    m = get_preferred_taxonomic_match('black backed jackal', lookup)
    assert m.scientific_name == 'black-backed jackal'
    assert m.taxonomy_levels['family'] == 'canidae'
    assert m.taxonomy_levels['class'] == 'mammalia'

    # 'sp.'/rank-word stripping + synonym
    m = get_preferred_taxonomic_match('squirrel species', lookup)
    assert m.scientific_name == 'sciurus'

    # Unresolvable stays empty
    m = get_preferred_taxonomic_match('martian rover', lookup)
    assert m.scientific_name == ''

    # GBIF backbone dump loading (offline local file)
    tsv = tmp_path / 'Taxon.tsv'
    tsv.write_text(
        'taxonID\tparentNameUsageID\tcanonicalName\ttaxonRank\t'
        'kingdom\tvernacularName\n'
        '10\t\tMammalia\tclass\tAnimalia\t\n'
        '11\t10\tVulpes vulpes\tspecies\tAnimalia\tred fox\n'
        '12\t\tQuercus\tgenus\tPlantae\toak\n')
    gbif = load_gbif_backbone(str(tsv))
    node = gbif.lookup('red fox')
    assert node is not None and node.name == 'vulpes vulpes'
    # Plantae filtered out by the kingdom filter
    assert gbif.lookup('oak') is None
