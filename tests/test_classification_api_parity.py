"""
Reference exact-name parity for the classification toolchain
(reference: megadetector/classification/*): the function names a
reference user would import, implemented over this repo's structures.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


@pytest.fixture()
def image_tree(tmp_path):
    rng = np.random.RandomState(0)
    images_dir = tmp_path / 'images'
    (images_dir / 'ds1').mkdir(parents=True)
    for name in ('a.jpg', 'b.jpg'):
        Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                    dtype=np.uint8)).save(
            str(images_dir / 'ds1' / name))
    return str(images_dir)


def test_crop_helpers(image_tree, tmp_path):
    from megadetector_tpu.classification.crop_detections import (
        load_and_crop, load_local_image, save_crop)

    img = load_local_image(os.path.join(image_tree, 'ds1', 'a.jpg'))
    assert img is not None and img.size == (80, 60)
    assert load_local_image(os.path.join(image_tree, 'nope.jpg')) is None

    crop_path = str(tmp_path / 'crops' / 'a_crop.jpg')
    assert save_crop(img, [0.25, 0.25, 0.5, 0.5], False, crop_path)
    with Image.open(crop_path) as crop:
        assert crop.size == (40, 30)

    # Square crops expand the short side
    crop_sq = str(tmp_path / 'crops' / 'a_sq.jpg')
    assert save_crop(img, [0.25, 0.25, 0.5, 0.25], True, crop_sq)
    with Image.open(crop_sq) as crop:
        assert crop.size[0] == crop.size[1]

    # load_and_crop writes only missing crops, counts saves
    template = str(tmp_path / 'crops2' / '{img_path}___crop{n:>02d}.jpg')
    bbox_dicts = [
        {'conf': 0.9, 'bbox': [0.1, 0.1, 0.3, 0.3]},
        {'conf': 0.1, 'bbox': [0.5, 0.5, 0.2, 0.2]},  # below threshold
    ]
    downloaded, n_saved = load_and_crop(
        'ds1/a.jpg', image_tree, None, bbox_dicts,
        confidence_threshold=0.5, crop_path_template=template,
        square_crops=False)
    assert downloaded is False and n_saved == 1
    # Second call: crop exists, nothing saved
    _, n_saved = load_and_crop(
        'ds1/a.jpg', image_tree, None, bbox_dicts,
        confidence_threshold=0.5, crop_path_template=template,
        square_crops=False)
    assert n_saved == 0
    with pytest.raises(AssertionError):
        load_and_crop('ds1/a.jpg', image_tree, object(), bbox_dicts,
                      0.5, template)


def _stage_detection_cache(base_dir, detector_version='5a.0.0'):
    cache_dir = os.path.join(base_dir, 'v{}'.format(detector_version))
    os.makedirs(cache_dir, exist_ok=True)
    ct_utils.write_json(os.path.join(cache_dir, 'ds1.json'), {
        'images': [
            {'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.3, 0.3]},
                {'category': '2', 'conf': 0.95,
                 'bbox': [0.2, 0.2, 0.2, 0.2]}]},
        ],
        'detection_categories': {'1': 'animal', '2': 'person'},
        'info': {'detector': 'megadetector_v5a'},
    })
    return cache_dir


def test_load_detection_cache_and_create_classification_csv(tmp_path):
    from megadetector_tpu.classification.crop_detections import \
        crop_filename
    from megadetector_tpu.classification.create_classification_dataset \
        import create_classification_csv
    from megadetector_tpu.classification.detect_and_crop import \
        load_detection_cache

    cache_base = str(tmp_path / 'cache')
    cache_dir = _stage_detection_cache(cache_base)

    cache, categories = load_detection_cache(cache_dir, ['ds1', 'ds2'])
    assert 'a.jpg' in cache['ds1']
    assert cache['ds2'] == {}
    assert categories['1'] == 'animal'

    queried = {
        'ds1/a.jpg': {'dataset': 'ds1', 'location': 'loc1',
                      'class': 'deer', 'label': ['cervid']},
        'ds1/b.jpg': {'dataset': 'ds1', 'location': 'loc2',
                      'class': 'elk', 'label': ['cervid'],
                      'bbox': [{'category': 'animal',
                                'bbox': [0.1, 0.1, 0.5, 0.5]}]},
        'ds1/c.jpg': {'dataset': 'ds1', 'location': 'loc1',
                      'class': 'bear', 'label': ['bear']},
    }
    queried_path = str(tmp_path / 'queried.json')
    ct_utils.write_json(queried_path, queried)

    crops_dir = tmp_path / 'crops'
    crops_dir.mkdir()
    # a.jpg's animal crop 0 exists (mdv), b.jpg's ground-truth crop 0
    for rel in (crop_filename('ds1/a.jpg', 0, '5a.0.0'),
                crop_filename('ds1/b.jpg', 0, None)):
        p = crops_dir / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b'x')

    df, log = create_classification_csv(
        queried_path, cache_base, '5a.0.0', str(crops_dir),
        confidence_threshold=0.5)
    assert set(df['path']) == {crop_filename('ds1/a.jpg', 0, '5a.0.0'),
                               crop_filename('ds1/b.jpg', 0, None)}
    # Ground truth crops carry confidence 1.0
    by_path = df.set_index('path')
    assert by_path.loc[crop_filename('ds1/b.jpg', 0, None),
                       'confidence'] == 1.0
    # c.jpg has no cache entry
    assert log['images missing detections'] == ['ds1/c.jpg']
    # a.jpg's person detection was skipped (non-animal), its crop 1
    # never existed -> not in missing crops (not animal); loc filter
    df2, _ = create_classification_csv(
        queried_path, cache_base, '5a.0.0', str(crops_dir),
        confidence_threshold=0.5, exclude_locs={('ds1', 'loc1')})
    assert set(df2['location']) == {'loc2'}
    # min_locs: cervid spans 2 locations, so min_locs=3 drops all
    df3, _ = create_classification_csv(
        queried_path, cache_base, '5a.0.0', str(crops_dir),
        confidence_threshold=0.5, min_locs=3)
    assert len(df3) == 0


def _split_df():
    import pandas as pd
    rows = []
    rng = np.random.RandomState(0)
    for i_loc in range(12):
        n = int(rng.randint(5, 30))
        label = 'deer' if i_loc % 2 == 0 else 'elk'
        for _ in range(n):
            rows.append({'dataset': 'ds{}'.format(i_loc % 3),
                         'location': 'loc{}'.format(i_loc),
                         'label': label})
    return pd.DataFrame(rows)


def test_split_functions():
    from megadetector_tpu.classification.create_classification_dataset \
        import (create_splits_random,
                create_splits_smallest_label_first, sort_locs_by_size)

    loc_to_size = {('a', 'l1'): 5, ('b', 'l2'): 2, ('a', 'l3'): 9}
    assert sort_locs_by_size(dict(loc_to_size)) == \
        [('b', 'l2'), ('a', 'l1'), ('a', 'l3')]
    # Prioritized datasets come first (smallest-first within)
    assert sort_locs_by_size(dict(loc_to_size), prioritize=['b']) == \
        [('b', 'l2'), ('a', 'l1'), ('a', 'l3')]
    assert sort_locs_by_size(dict(loc_to_size), prioritize=['a']) == \
        [('a', 'l1'), ('a', 'l3'), ('b', 'l2')]

    df = _split_df()
    all_locs = set(zip(df['dataset'], df['location']))

    splits = create_splits_random(df, val_frac=0.2, test_frac=0.2,
                                  n_iterations=50, seed=0)
    assert set(splits) == {'train', 'val', 'test'}
    assigned = [loc for locs in splits.values() for loc in locs]
    assert len(assigned) == len(all_locs)
    assert set(assigned) == all_locs

    splits = create_splits_smallest_label_first(df, val_frac=0.2,
                                                test_frac=0.2)
    assigned = [loc for locs in splits.values() for loc in locs]
    assert sorted(assigned) == sorted(all_locs)
    assert len(splits['test']) > 0 and len(splits['val']) > 0

    # test_split passthrough
    fixed_test = {('ds0', 'loc0')}
    splits = create_splits_smallest_label_first(df, val_frac=0.2,
                                                test_split=fixed_test)
    assert splits['test'] == [('ds0', 'loc0')]
    assert ('ds0', 'loc0') not in splits['train'] + splits['val']


def test_calc_per_label_stats():
    from megadetector_tpu.classification.evaluate_model import \
        calc_per_label_stats

    cm = np.array([[8, 2, 0],
                   [1, 9, 0],
                   [0, 0, 0]])
    df = calc_per_label_stats(cm, ['deer', 'elk', 'bear'])
    assert df.loc['deer', 'precision'] == pytest.approx(8 / 9)
    assert df.loc['deer', 'recall'] == pytest.approx(0.8)
    # Zero ground-truth observations -> NaN recall
    assert np.isnan(df.loc['bear', 'recall'])


def test_get_output_json(tmp_path):
    from megadetector_tpu.classification.json_validator import \
        get_output_json

    label_to_inclusions = {'cervid': {('ds1', 'deer'), ('ds1', 'elk')}}
    image_source = {
        'ds1/a.jpg': {'dataset': 'ds1', 'class': 'deer',
                      'location': 'l1'},
        'ds1/b.jpg': {'dataset': 'ds1', 'class': 'elk',
                      'location': 'l2'},
        'ds1/c.jpg': {'dataset': 'ds1', 'class': 'bear',
                      'location': 'l1'},
    }
    out = get_output_json(label_to_inclusions,
                          image_source=image_source)
    assert sorted(out) == ['ds1/a.jpg', 'ds1/b.jpg']
    assert out['ds1/a.jpg']['label'] == ['cervid']

    # Known-mislabeled images get excluded
    mdir = tmp_path / 'megadb_mislabeled'
    mdir.mkdir()
    (mdir / 'ds1.csv').write_text('file,correct_class\na.jpg,elk\n')
    out = get_output_json(label_to_inclusions,
                          mislabeled_images_dir=str(mdir),
                          image_source=image_source)
    assert sorted(out) == ['ds1/b.jpg']


def test_merge_reference_functions(tmp_path):
    import pandas as pd

    from megadetector_tpu.classification.\
        merge_classification_detection_output import (
            combine_classification_with_detection,
            process_queried_images, row_to_classification_list)

    label_names = ['bear', 'deer', 'elk']

    # row_to_classification_list
    row = {'bear': 0.1, 'deer': 0.7, 'elk': 0.2, 'label': 'elk'}
    out = row_to_classification_list(row, label_names,
                                     contains_preds=True,
                                     label_pos='last', threshold=0.15)
    assert out[0] == ('1', 0.7)
    assert out[-1] == (str(1000000 + 2), 1.0)
    assert all(conf >= 0.15 for _, conf in out[:-1])
    out = row_to_classification_list(row, label_names,
                                     contains_preds=True,
                                     label_pos='first', threshold=0.0,
                                     relative_conf=True)
    assert out[0] == (str(1000000 + 2), 1.0)
    # Relative confidences subtract the label's own confidence
    assert dict(out[1:])['1'] == pytest.approx(0.5)

    # process_queried_images over a staged cache
    cache_base = str(tmp_path / 'cache')
    _stage_detection_cache(cache_base)
    queried = {
        'ds1/a.jpg': {'dataset': 'ds1', 'class': 'deer',
                      'label': ['deer']},
        'ds1/b.jpg': {'dataset': 'ds1', 'class': 'elk',
                      'label': ['elk'],
                      'bbox': [{'category': 'animal',
                                'bbox': [0.1, 0.1, 0.5, 0.5]}]},
    }
    queried_path = str(tmp_path / 'queried.json')
    ct_utils.write_json(queried_path, queried)

    df = pd.DataFrame(
        {'label': ['deer', 'elk'],
         'bear': [0.1, 0.2], 'deer': [0.8, 0.1], 'elk': [0.1, 0.7]},
        index=['ds1/a.jpg___crop00_mdv5a.0.0.jpg',
               'ds1/b.jpg___crop00.jpg'])
    detection_js = process_queried_images(
        df, queried_path, cache_base, '5a.0.0')
    assert set(detection_js['images']) == {'ds1/a.jpg', 'ds1/b.jpg'}
    # Ground-truth boxes synthesize confidence-1.0 detections
    gt_det = detection_js['images']['ds1/b.jpg']['detections'][0]
    assert gt_det['conf'] == 1.0 and gt_det['category'] == '1'

    # combine_classification_with_detection
    idx_to_label = {str(i): n for i, n in enumerate(label_names)}
    merged = combine_classification_with_detection(
        detection_js, df, idx_to_label, label_names,
        classifier_name='efficientnet', classifier_timestamp='now',
        threshold=0.15, label_pos='last',
        typical_confidence_threshold=0.4)
    assert isinstance(merged['images'], list)
    by_file = {im['file']: im for im in merged['images']}
    cls = by_file['ds1/a.jpg']['detections'][0]['classifications']
    assert cls[0] == ('1', 0.8) or cls[0] == ['1', 0.8]
    assert merged['info']['classifier'] == 'efficientnet'
    assert merged['info']['classifier_metadata'][
        'typical_classification_threshold'] == 0.4


def test_get_candidates_df(tmp_path):
    from megadetector_tpu.classification.identify_mislabeled_candidates \
        import get_candidates_df

    csv_path = str(tmp_path / 'outputs.csv')
    with open(csv_path, 'w') as f:
        f.write('path,label,bear,deer\n')
        f.write('ds1/a___crop00.jpg,bear,0.9,0.1\n')   # correct
        f.write('ds1/b___crop00.jpg,bear,0.2,0.8\n')   # candidate
        f.write('ds1/c___crop00.jpg,bear,0.45,0.55\n')  # below margin
    df = get_candidates_df(csv_path, ['bear', 'deer'], margin=0.5)
    assert list(df['path']) == ['ds1/b___crop00.jpg']
    assert df.iloc[0]['pred'] == 'deer'


def test_update_mislabeled_images(tmp_path):
    from megadetector_tpu.classification.save_mislabeled import \
        update_mislabeled_images

    csv_path = str(tmp_path / 'review.csv')
    with open(csv_path, 'w') as f:
        f.write('RelativePath,File,mislabeled,correct_class\n')
        f.write('ds1\\cam1,im1.jpg,True,elk\n')
        f.write('ds1\\cam1,im2.jpg,False,\n')
        f.write('ds2\\cam9,im3.jpg,True,\n')

    update_mislabeled_images(str(tmp_path), csv_path)
    ds1 = open(tmp_path / 'megadb_mislabeled' / 'ds1.csv').read()
    assert 'cam1/im1.jpg,elk' in ds1
    assert 'im2.jpg' not in ds1
    assert os.path.isfile(tmp_path / 'megadb_mislabeled' / 'ds2.csv')

    # correct_class without mislabeled=True is an error
    with open(csv_path, 'w') as f:
        f.write('RelativePath,File,mislabeled,correct_class\n')
        f.write('ds1\\cam1,im1.jpg,False,elk\n')
    with pytest.raises(AssertionError):
        update_mislabeled_images(str(tmp_path), csv_path)


def test_check_image_condition_and_analyze_images(image_tree, tmp_path):
    from megadetector_tpu.classification.analyze_failed_images import (
        analyze_images, check_image_condition)

    good = os.path.join(image_tree, 'ds1', 'a.jpg')
    assert check_image_condition(good) == (good, 'good')
    assert check_image_condition('nope.jpg')[1] == 'nonexistent'
    assert check_image_condition('readme.txt')[1] == 'non_image'
    bad = str(tmp_path / 'bad.jpg')
    open(bad, 'wb').write(b'not a jpeg')
    assert check_image_condition(bad)[1] == 'bad'

    with pytest.raises(AssertionError):
        check_image_condition(good, account='acct', container='c')

    list_file = str(tmp_path / 'paths.txt')
    with open(list_file, 'w') as f:
        f.write(good + '\n' + bad + '\n')
    report = analyze_images(list_file)
    assert report['n_total'] == 2

    json_file = str(tmp_path / 'paths.json')
    ct_utils.write_json(json_file, {'missing': [bad], 'other': [good]})
    report = analyze_images(json_file, json_keys=['missing'])
    assert report['n_total'] == 1


def test_train_utils(tmp_path):
    import matplotlib
    matplotlib.use('Agg')

    from megadetector_tpu.classification.train_utils import (
        HeapItem, add_to_heap, fig_to_img, imgs_with_confidences,
        load_splits, plot_img_grid, prefix_all_keys,
        recall_from_confusion_matrix)

    # Bounded heap keeps the max-k priorities
    h = []
    for p in [5, 1, 9, 3, 7]:
        add_to_heap(h, HeapItem(priority=p, data='x{}'.format(p)), k=3)
    assert sorted(item.priority for item in h) == [5, 7, 9]

    assert prefix_all_keys({'a': 1}, 'train/') == {'train/a': 1}

    imgs = [np.zeros((8, 8, 3), np.uint8), np.ones((8, 8, 3), np.uint8)]
    fig = plot_img_grid(imgs, row_h=2, col_w=2, tags=['a', 'b'],
                        titles=['t1', 't2'])
    img = fig_to_img(fig)
    assert img.dtype == np.uint8 and img.ndim == 3

    fig, img_files = imgs_with_confidences(
        [(imgs[0], 0, [0.9, 0.1], [1, 0], 'f1.jpg')],
        label_names=['bear', 'deer'])
    assert img_files == ['f1.jpg']

    splits = {'train': [['ds1', 'l1']], 'val': [['ds1', 'l2']],
              'test': [['ds1', 'l3']]}
    splits_path = str(tmp_path / 'splits.json')
    ct_utils.write_json(splits_path, splits)
    loaded = load_splits(splits_path)
    assert loaded['train'] == {('ds1', 'l1')}

    # Overlapping splits are rejected
    splits['val'] = [['ds1', 'l1']]
    ct_utils.write_json(splits_path, splits)
    with pytest.raises(AssertionError):
        load_splits(splits_path)

    recalls = recall_from_confusion_matrix(
        np.array([[8, 2], [5, 5]]), ['bear', 'deer'])
    assert recalls['bear'] == pytest.approx(0.8, abs=1e-6)
    assert recalls['deer'] == pytest.approx(0.5, abs=1e-6)


def test_csv_to_json(tmp_path):
    from megadetector_tpu.classification.csv_to_json import (
        csv_to_jsondict, order_spec_dict)

    csv_path = str(tmp_path / 'spec.csv')
    with open(csv_path, 'w') as f:
        f.write('# a comment\n')
        f.write('output_label,type,content\n')
        f.write('cervid,row,idfg|deer\n')
        f.write('cervid,row,idfg|elk\n')
        f.write('cervid,max_count,50000\n')
        f.write('cervid,family,cervidae\n')
        f.write('cervid,datasettaxon,idfg|family|cervidae\n')
        f.write('bird,class,aves\n')
        f.write('bird,prioritize,"[[\'idfg_swwlf_2019\'], [\'idfg\']]"\n')
        f.write('!bird,row,idfg|turkey\n')

    js = csv_to_jsondict(csv_path)
    assert js['cervid']['dataset_labels']['idfg'] == ['deer', 'elk']
    assert js['cervid']['max_count'] == 50000
    taxa = js['cervid']['taxa']
    assert {'level': 'family', 'name': 'cervidae'} in taxa
    assert {'level': 'family', 'name': 'cervidae',
            'datasets': ['idfg']} in taxa
    assert js['bird']['prioritize'] == [['idfg_swwlf_2019'], ['idfg']]
    assert js['bird']['exclude']['dataset_labels']['idfg'] == ['turkey']

    ordered = order_spec_dict(js['bird'])
    keys = list(ordered.keys())
    assert keys == [k for k in ['dataset_labels', 'taxa', 'exclude',
                                'max_count', 'prioritize'] if k in keys]
