"""
Classifier-training toolchain round trip (round-2 verdict item 7):
detections -> crops -> queried-images validation -> dataset CSV +
location splits -> one training step -> evaluation report -> merged MD
file with classifications. File contracts follow the reference
(megadetector/classification/): ___cropXX_mdvY.Y naming,
classification_ds.csv columns, label_index.json / splits.json, the
outputs_{split}.csv shape, and the merged classifications format
(including the 1000000+ label-category offset).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from megadetector_tpu.utils import ct_utils


@pytest.fixture(scope='module')
def world(tmp_path_factory):
    """Images + detections JSON + queried-images source for 2 classes
    across 4 locations."""

    base = tmp_path_factory.mktemp('clf_world')
    images_dir = base / 'images'
    rng = np.random.RandomState(0)

    files = {}
    queried = {}
    det_images = []
    for i in range(8):
        loc = i % 4
        cls = 'deer' if i % 2 == 0 else 'bear'
        fn = 'camtrap/loc{}/im_{}.jpg'.format(loc, i)
        p = images_dir / fn
        p.parent.mkdir(parents=True, exist_ok=True)
        arr = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(p))
        files[fn] = arr
        queried[fn] = {'dataset': 'camtrap', 'location': str(loc),
                       'class': cls}
        det_images.append({
            'file': fn,
            'detections': [
                {'category': '1', 'conf': 0.95,
                 'bbox': [0.1, 0.1, 0.5, 0.6]},
                {'category': '1', 'conf': 0.3,   # below crop threshold
                 'bbox': [0.6, 0.2, 0.2, 0.2]},
            ]})

    detections = {
        'images': det_images,
        'detection_categories': {'1': 'animal'},
        'info': {'format_version': '1.6', 'detector': 'md_v5a.0.0.pt'},
    }
    det_path = str(base / 'detections.json')
    ct_utils.write_json(det_path, detections)
    src_path = str(base / 'image_source.json')
    ct_utils.write_json(src_path, queried)
    return {'base': str(base), 'images_dir': str(images_dir),
            'detections': det_path, 'source': src_path,
            'queried': queried}


def test_full_toolchain_round_trip(world, tmp_path_factory):
    out = tmp_path_factory.mktemp('clf_out')

    # --- 1. label-spec validation -> queried_images.json
    from megadetector_tpu.classification.json_validator import \
        run_validator
    spec = {
        'cervid': {'dataset_labels': {'camtrap': ['deer']}},
        'ursid': {'dataset_labels': {'camtrap': ['bear']},
                  'max_count': 10},
    }
    spec_path = str(out / 'label_spec.json')
    ct_utils.write_json(spec_path, spec)
    validator_dir = str(out / 'validator')
    queried = run_validator(spec_path, world['source'],
                            output_dir=validator_dir,
                            images_dir=world['images_dir'])
    assert len(queried) == 8
    assert all(info['label'] in (['cervid'], ['ursid'])
               for info in queried.values())
    assert os.path.isfile(
        os.path.join(validator_dir, 'queried_images.json'))
    assert os.path.isfile(
        os.path.join(validator_dir,
                     'image_counts_by_label_presample.json'))

    # --- 2. crops from detections
    from megadetector_tpu.classification.crop_detections import (
        crop_detections, crop_filename)
    crops_dir = str(out / 'crops')
    n_crops, failed = crop_detections(
        world['detections'], crops_dir, world['images_dir'],
        threshold=0.8, square_crops=True, logdir=str(out))
    assert failed == []
    assert n_crops == 8  # one above-threshold detection per image
    sample = os.path.join(
        crops_dir, crop_filename('camtrap/loc0/im_0.jpg', 0, '5a.0.0'))
    assert os.path.isfile(sample)
    crop = np.asarray(Image.open(sample))
    assert crop.shape[0] == crop.shape[1]  # square crop

    # --- 3. dataset CSV + label index + location splits
    from megadetector_tpu.classification.create_classification_dataset \
        import (create_classification_dataset, load_dataset_csv,
                rows_for_split)
    queried_path = os.path.join(validator_dir, 'queried_images.json')
    ds_dir = str(out / 'dataset')
    rows, label_index, splits = create_classification_dataset(
        queried_path, crops_dir, ds_dir,
        detections_json=world['detections'],
        detector_version='5a.0.0',
        confidence_threshold=0.8,
        split_fractions=(0.5, 0.25, 0.25))
    assert len(rows) == 8
    assert sorted(label_index.values()) == ['cervid', 'ursid']
    # Every location lands in exactly one split
    all_locs = [tuple(lc) for s in splits.values() for lc in s]
    assert len(all_locs) == len(set(all_locs)) == 4
    rows_back = load_dataset_csv(
        os.path.join(ds_dir, 'classification_ds.csv'))
    assert len(rows_back) == 8
    assert rows_back[0]['confidence'] == '0.95'

    # --- 4. one training step on the crops
    import jax
    import jax.numpy as jnp
    import optax
    from megadetector_tpu.models import efficientnet
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.training.train_classifier import \
        make_train_step
    from megadetector_tpu.visualization import \
        visualization_utils as vis_utils

    label_names = [label_index[str(i)] for i in range(len(label_index))]
    name_to_id = {n: i for i, n in enumerate(label_names)}
    config = efficientnet.EfficientNetConfig(
        'efficientnetv2_s', num_classes=len(label_names), image_size=64)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        efficientnet.init_params(config, seed=0, train_init=True))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(config, optimizer))

    imgs = []
    labels = []
    for r in rows_back[:4]:
        img = np.asarray(vis_utils.load_image(
            os.path.join(crops_dir, r['path'])))
        import cv2
        imgs.append(cv2.resize(img, (64, 64)))
        labels.append(name_to_id[r['label']])
    params, opt_state, metrics = step(
        params, opt_state,
        np.stack(imgs).astype(np.uint8),
        np.asarray(labels, np.int32))
    assert np.isfinite(float(metrics['loss']))

    ckpt_path = str(out / 'classifier.npz')
    save_checkpoint(
        jax.tree_util.tree_map(np.asarray, params), ckpt_path, {
            'arch': 'efficientnetv2_s',
            'num_classes': len(label_names),
            'class_names': label_names,
            'image_size': 64,
        })

    # --- 5. evaluation report
    from megadetector_tpu.classification.evaluate_model import \
        evaluate_model
    eval_dir = str(out / 'eval')
    overall = evaluate_model(ckpt_path, ds_dir, crops_dir, eval_dir,
                             batch_size=4)
    assert len(overall) >= 1
    assert os.path.isfile(os.path.join(eval_dir, 'overall_metrics.csv'))
    assert os.path.isfile(os.path.join(eval_dir, 'label_stats.csv'))
    cms = np.load(os.path.join(eval_dir, 'confusion_matrices.npz'))
    assert all(cms[k].shape == (2, 2) for k in cms.files)
    out_csvs = [f for f in os.listdir(eval_dir)
                if f.startswith('outputs_')]
    assert out_csvs
    header = open(os.path.join(eval_dir, out_csvs[0])).readline()
    assert header.startswith('path,label,weight,')
    assert 'cervid' in header and 'ursid' in header

    # --- 6. merge eval outputs back into the detections file
    from megadetector_tpu.classification \
        .merge_classification_detection_output import \
        merge_classification_detection_output
    merged_path = str(out / 'merged.json')
    merged = merge_classification_detection_output(
        os.path.join(eval_dir, out_csvs[0]),
        world['detections'], merged_path,
        label_index_path=os.path.join(ds_dir, 'label_index.json'),
        classifier_name='test_classifier')
    assert merged['classification_categories']['0'] in \
        ('cervid', 'ursid')
    n_with_cls = sum(
        1 for im in merged['images']
        for d in im.get('detections') or []
        if 'classifications' in d)
    assert n_with_cls >= 1
    for im in merged['images']:
        for d in im.get('detections') or []:
            for pair in d.get('classifications', []):
                assert isinstance(pair[0], str)
    # Sorted descending by confidence
    for im in merged['images']:
        for d in im.get('detections') or []:
            confs = [p[1] for p in d.get('classifications', [])
                     if int(p[0]) < 1000000]
            assert confs == sorted(confs, reverse=True)

    # Merged file still validates as MD format
    from megadetector_tpu.postprocessing.validate_batch_results import (
        ValidateBatchResultsOptions, validate_batch_results)
    v_opts = ValidateBatchResultsOptions()
    v = validate_batch_results(merged_path, v_opts)
    assert v['validation_results']['validation_errors'] == []


def test_merge_label_only_uses_offset_categories(world,
                                                 tmp_path_factory):
    """A dataset CSV with only ground-truth labels merges as
    [[str(1000000+id), 1.0]] (reference contract)."""

    out = tmp_path_factory.mktemp('clf_label_only')
    from megadetector_tpu.classification.crop_detections import \
        crop_filename
    from megadetector_tpu.classification \
        .merge_classification_detection_output import \
        merge_classification_detection_output

    csv_path = str(out / 'ds.csv')
    with open(csv_path, 'w') as f:
        f.write('path,dataset,location,dataset_class,confidence,label\n')
        f.write('{},camtrap,0,deer,0.95,cervid\n'.format(
            crop_filename('camtrap/loc0/im_0.jpg', 0, '5a.0.0')))
    label_index_path = str(out / 'label_index.json')
    ct_utils.write_json(label_index_path,
                        {'0': 'cervid', '1': 'ursid'})

    merged = merge_classification_detection_output(
        csv_path, world['detections'], str(out / 'merged.json'),
        label_index_path=label_index_path)
    det = [im for im in merged['images']
           if im['file'] == 'camtrap/loc0/im_0.jpg'][0]['detections'][0]
    assert det['classifications'] == [['1000000', 1.0]]
    assert merged['classification_categories']['1000000'] == 'cervid'


def test_run_classifier_over_crops(world, tmp_path_factory):
    """run_classifier: crops folder + checkpoint -> classifications
    merged into the detections file + per-crop CSV (reference
    classification/run_classifier.py)."""

    out = tmp_path_factory.mktemp('run_clf')

    from megadetector_tpu.classification.crop_detections import \
        crop_detections
    crops_dir = str(out / 'crops')
    crop_detections(world['detections'], crops_dir,
                    world['images_dir'], threshold=0.8,
                    detector_version='5a.0.0')

    import jax
    import numpy as np
    from megadetector_tpu.models import efficientnet
    from megadetector_tpu.models.convert_weights import save_checkpoint
    config = efficientnet.EfficientNetConfig(
        'efficientnetv2_s', num_classes=3, image_size=64)
    ckpt = str(out / 'clf.npz')
    save_checkpoint(
        jax.tree_util.tree_map(np.asarray,
                               efficientnet.init_params(config, seed=1)),
        ckpt, {'arch': 'efficientnetv2_s', 'num_classes': 3,
               'class_names': ['deer', 'bear', 'other'],
               'image_size': 64})

    from megadetector_tpu.classification.run_classifier import \
        run_classifier
    merged_path = str(out / 'merged.json')
    csv_path = str(out / 'confs.csv')
    merged = run_classifier(world['detections'], crops_dir, ckpt,
                            output_json_path=merged_path,
                            output_csv_path=csv_path, batch_size=4)

    assert merged['classification_categories'] == {
        '0': 'deer', '1': 'bear', '2': 'other'}
    n_cls = sum(1 for im in merged['images']
                for d in im.get('detections') or []
                if d.get('classifications'))
    assert n_cls == 8  # one above-threshold crop per image
    for im in merged['images']:
        for d in im.get('detections') or []:
            for pair in d.get('classifications', []):
                assert isinstance(pair[0], str)
            confs = [p[1] for p in d.get('classifications', [])]
            assert confs == sorted(confs, reverse=True)
    header = open(csv_path).readline().strip()
    assert header == 'path,deer,bear,other'
    assert len(open(csv_path).readlines()) == 9


def test_cache_batchapi_outputs(tmp_path):
    import json
    import os

    from megadetector_tpu.classification.cache_batchapi_outputs import (
        cache_detections, cache_json)

    def md(files):
        return {
            'info': {'format_version': '1.6',
                     'detector': 'md_v5a.0.0.pt'.replace('.pt', '')},
            'detection_categories': {'1': 'animal'},
            'images': [{'file': f, 'detections': []} for f in files],
        }

    base = str(tmp_path / 'cache')
    det_file = str(tmp_path / 'det.json')
    with open(det_file, 'w') as f:
        json.dump(md(['a.jpg', 'b.jpg']), f)

    cache_json(det_file, is_detections=True, dataset='ds1',
               detector_output_cache_base_dir=base)
    cache_path = os.path.join(base, 'v5a.0.0', 'ds1.json')
    assert os.path.isfile(cache_path)
    with open(cache_path) as f:
        assert len(json.load(f)['images']) == 2

    # Second cache call merges (non-unique files allowed)
    msg = cache_detections(md(['b.jpg', 'c.jpg']), 'ds1',
                           os.path.join(base, 'v5a.0.0'))
    assert 'Merging' in msg
    with open(cache_path) as f:
        files = [im['file'] for im in json.load(f)['images']]
    assert set(files) == {'a.jpg', 'b.jpg', 'c.jpg'}

    # Version mismatch raises
    import pytest
    with pytest.raises(AssertionError):
        cache_json(det_file, is_detections=True, dataset='ds1',
                   detector_output_cache_base_dir=base,
                   detector_version='4.1')

    # Batch API response path resolves through fetch_fn
    resp_file = str(tmp_path / 'resp.json')
    with open(resp_file, 'w') as f:
        json.dump({
            'Status': {'request_status': 'completed', 'message': {
                'output_file_urls': {
                    'detections': 'http://x/task7/detections.json'}}},
            'TaskId': 'task7'}, f)
    cache_json(resp_file, is_detections=False, dataset='ds2',
               detector_output_cache_base_dir=base,
               fetch_fn=lambda url: md(['z.jpg']))
    assert os.path.isfile(os.path.join(base, 'v5a.0.0', 'ds2.json'))
