"""
classification/train_classifier.py: the reference-shaped CSV-dataset
trainer (dataloaders with label/conf weighting, finetune masks,
correct(), run_epoch/log_run, end-to-end main()).
"""

import json
import os

import numpy as np
import pytest

from PIL import Image


@pytest.fixture
def dataset(tmp_path):
    crops_dir = tmp_path / 'crops'
    rows = []
    rng = np.random.RandomState(0)
    label_names = ['bear', 'deer']
    for i in range(8):
        label = label_names[i % 2]
        loc = 'locA' if i < 6 else 'locB'
        rel = 'ds1/img_{}___crop00_mdv5.0.jpg'.format(i)
        p = crops_dir / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (40, 50, 3),
                                    dtype=np.uint8)).save(p)
        rows.append({'path': rel, 'dataset': 'ds1', 'location': loc,
                     'dataset_class': label,
                     'confidence': 0.5 + 0.05 * i, 'label': label})

    ds_dir = tmp_path / 'dataset'
    ds_dir.mkdir()
    with open(ds_dir / 'classification_ds.csv', 'w') as f:
        cols = ['path', 'dataset', 'location', 'dataset_class',
                'confidence', 'label']
        f.write(','.join(cols) + '\n')
        for r in rows:
            f.write(','.join(str(r[c]) for c in cols) + '\n')
    with open(ds_dir / 'label_index.json', 'w') as f:
        json.dump({'0': 'bear', '1': 'deer'}, f)
    with open(ds_dir / 'splits.json', 'w') as f:
        json.dump({'train': [['ds1', 'locA']],
                   'val': [['ds1', 'locB']], 'test': []}, f)
    return str(ds_dir), str(crops_dir)


def test_create_dataloaders(dataset):
    from megadetector_tpu.classification.train_classifier import \
        create_dataloaders

    ds_dir, crops_dir = dataset
    loaders, label_names = create_dataloaders(
        os.path.join(ds_dir, 'classification_ds.csv'),
        os.path.join(ds_dir, 'label_index.json'),
        os.path.join(ds_dir, 'splits.json'),
        crops_dir, img_size=32, multilabel=False, label_weighted=True,
        weight_by_detection_conf=False, batch_size=4)

    assert label_names == ['bear', 'deer']
    assert set(loaders) == {'train', 'val'}

    batches = list(loaders['train']())
    assert sum(len(b[3]) for b in batches) == 6
    imgs, labels, weights, files = batches[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert imgs.dtype == np.float32
    assert labels.dtype == np.int32
    # Label weighting: weights sum to the split size across the epoch
    total_w = sum(float(b[2].sum()) for b in batches)
    # Weighted sampling resamples rows, so the sum is approximate
    assert 2.0 < total_w < 18.0

    val_batches = list(loaders['val']())
    assert sum(len(b[3]) for b in val_batches) == 2
    # Validation is deterministic
    v2 = list(loaders['val']())
    assert np.allclose(val_batches[0][0], v2[0][0])


def test_correct_and_meters():
    from megadetector_tpu.classification.train_classifier import (
        AverageMeter, correct)

    outputs = np.asarray([[0.9, 0.1, 0.0],
                          [0.2, 0.5, 0.3],
                          [0.1, 0.3, 0.6]])
    labels = np.asarray([0, 2, 2])
    c = correct(outputs, labels, top=(1, 2))
    assert c[1] == 2.0  # rows 0 and 2
    assert c[2] == 3.0  # row 1's label 2 is the 2nd-highest

    weighted = correct(outputs, labels,
                       weights=np.asarray([2.0, 1.0, 1.0]), top=(1,))
    assert weighted[1] == 3.0

    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9


def test_build_model_and_finetune_mask():
    import jax

    from megadetector_tpu.classification.train_classifier import \
        build_model

    config, params, mask = build_model('efficientnetv2_s', 3,
                                       pretrained=False, finetune=True)
    assert config.num_classes == 3
    leaves_with_path = jax.tree_util.tree_leaves_with_path(mask)
    trainable = [p for p, v in leaves_with_path if v]
    frozen = [p for p, v in leaves_with_path if not v]
    assert len(trainable) == 2  # fc w and b
    assert all('fc' in jax.tree_util.keystr(p) for p in trainable)
    assert len(frozen) > 10

    # finetune=False: everything trains
    _, _, mask_all = build_model('efficientnetv2_s', 3,
                                 pretrained=False, finetune=False)
    assert all(v for _, v in
               jax.tree_util.tree_leaves_with_path(mask_all))

    with pytest.raises(AssertionError):
        build_model('not_a_model', 3, False, False)


def test_main_end_to_end(dataset, tmp_path):
    from megadetector_tpu.classification.train_classifier import main

    ds_dir, crops_dir = dataset
    logdir = str(tmp_path / 'run')
    best = main(ds_dir, crops_dir, model_name='efficientnetv2_s',
                epochs=1, batch_size=2, img_size=32, lr=1e-3,
                label_weighted=True, logdir=logdir, seed=0)

    assert best is not None and 'acc_top1' in best
    assert os.path.isfile(os.path.join(logdir, 'params.npz'))
    assert os.path.isfile(os.path.join(logdir, 'label_index.json'))
    with open(os.path.join(logdir, 'metrics.csv')) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == 'split,epoch,metric,value'
    assert any(line.startswith('val,0,acc_top1') for line in lines)

    # The saved checkpoint round-trips through SpeciesClassifier
    from megadetector_tpu.models.classifier import SpeciesClassifier
    clf = SpeciesClassifier(os.path.join(logdir, 'params.npz'))
    assert clf.class_names == ['bear', 'deer']


def test_trace_model(dataset, tmp_path):
    import jax
    import numpy as np
    from jax import export as jax_export

    from megadetector_tpu.classification.evaluate_model import \
        trace_model
    from megadetector_tpu.classification.train_classifier import main

    ds_dir, crops_dir = dataset
    logdir = str(tmp_path / 'run')
    main(ds_dir, crops_dir, epochs=1, batch_size=2, img_size=32,
         logdir=logdir)

    ckpt = os.path.join(logdir, 'params.npz')
    compiled = trace_model('efficientnetv2_s', ckpt, 2, 32)
    assert compiled.endswith('_compiled.npz')
    # Reuse on second call
    assert trace_model('efficientnetv2_s', ckpt, 2, 32) == compiled

    with open(compiled, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    x = np.zeros((1, 32, 32, 3), np.float32)
    logits = exported.call(x)
    assert np.asarray(logits).shape == (1, 2)
