"""
Tests for the ecosystem long-tail modules: string/split/directory
utils, WI taxonomy utilities, COCO tools, image-file tools, OCR
datetime extraction, LILA reports, WI CSV conversion,
top_folders_to_bottom, classification analysis, and the exiftool
backend gating.
"""

import json
import os

import numpy as np
import pytest

from PIL import Image


def test_string_utils():
    from megadetector_tpu.utils.string_utils import (
        human_readable_to_bytes, is_float, is_int, remove_ansi_codes)

    assert is_float('3.5') and is_float(2) and not is_float('abc')
    assert is_int('7') and not is_int('7.5') and not is_int(None)
    assert human_readable_to_bytes('3 MB') == 3 * 1024 ** 2
    assert human_readable_to_bytes('1.5GB') == 1.5 * 1024 ** 3
    assert human_readable_to_bytes('200k') == 200 * 1024
    assert human_readable_to_bytes(42) == 42.0
    assert remove_ansi_codes('\x1b[31mred\x1b[0m') == 'red'


def test_split_locations():
    from megadetector_tpu.utils.split_locations_into_train_val import \
        split_locations_into_train_val

    rng = np.random.RandomState(0)
    locations = {}
    for i in range(40):
        locations['loc{:03d}'.format(i)] = {
            'bear': int(rng.randint(0, 20)),
            'wolf': int(rng.randint(0, 10)),
            'elk': int(rng.randint(0, 30)),
        }
    val_ids, fractions = split_locations_into_train_val(
        locations, n_random_seeds=300, target_val_fraction=0.2,
        default_max_allowable_error=0.15)
    assert 0 < len(val_ids) < 40
    for cat, frac in fractions.items():
        assert abs(frac - 0.2) <= 0.15, (cat, frac)


def test_directory_listing(tmp_path):
    from megadetector_tpu.utils.directory_listing import \
        create_html_index

    sub = tmp_path / 'camA'
    sub.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        str(sub / 'img.jpg'))
    (tmp_path / 'notes.txt').write_text('x')
    written = create_html_index(str(tmp_path))
    assert len(written) == 2
    html = open(str(tmp_path / 'index.html')).read()
    assert 'camA' in html and 'notes.txt' in html
    sub_html = open(str(sub / 'index.html')).read()
    assert 'img.jpg' in sub_html and 'Preview image' in sub_html


def test_wi_taxonomy_utils_strings():
    from megadetector_tpu.utils import wi_taxonomy_utils as wtu

    s = 'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox'
    assert wtu.is_valid_prediction_string(s)
    assert wtu.get_common_name_from_prediction_string(s) == 'red fox'
    assert wtu.clean_taxonomy_string(s) == \
        'mammalia;carnivora;canidae;vulpes;vulpes;red fox'
    assert wtu.taxonomy_level_index(s) == 4
    assert wtu.is_animal_classification(s)
    assert not wtu.is_human_classification(s)
    assert wtu.is_human_classification(wtu.human_prediction_string)
    assert wtu.is_vehicle_classification(
        wtu.vehicle_prediction_string)
    assert not wtu.is_taxonomic_prediction_string(
        wtu.blank_prediction_string)


def test_predictions_json_round_trip(tmp_path):
    from megadetector_tpu.utils import wi_taxonomy_utils as wtu

    predictions = {'predictions': [
        {'filepath': '/data/images/a.jpg',
         'detections': [{'category': '1', 'label': 'animal',
                         'conf': 0.9, 'bbox': [0.1, 0.1, 0.4, 0.4]}],
         'classifications': {
             'classes': ['u1;mammalia;carnivora;canidae;vulpes;'
                         'vulpes;red fox'],
             'scores': [0.8]},
         'prediction': 'u1;mammalia;carnivora;canidae;vulpes;vulpes;'
                       'red fox',
         'prediction_score': 0.8},
        {'filepath': '/data/images/b.jpg',
         'detections': [],
         'prediction': 'u9;mammalia;cetartiodactyla;cervidae;;;'
                       'deer family',
         'prediction_score': 0.55},
        {'filepath': '/data/images/c.jpg',
         'failures': ['DETECTOR']},
    ]}

    out_file = str(tmp_path / 'md.json')
    md = wtu.generate_md_results_from_predictions_json(
        predictions, md_results_file=out_file, base_folder='/data/images')
    assert [im['file'] for im in md['images']] == \
        ['a.jpg', 'b.jpg', 'c.jpg']
    a, b, c = md['images']
    assert a['detections'][0]['classifications'][0][1] == 0.8
    # b had no detections but a non-blank prediction: fake detection
    assert len(b['detections']) == 1
    assert b['detections'][0]['bbox'] == [0, 0, 1, 1]
    assert md['detection_categories'][
        b['detections'][0]['category']] == 'unknown'
    assert c['detections'] is None and 'failure' in c
    assert 'red fox' in md['classification_categories'].values()
    assert any(v.startswith('u1;') for v in
               md['classification_category_descriptions'].values())

    # MD -> predictions.json
    back = wtu.generate_predictions_json_from_md_results(md)
    assert len(back['predictions']) == 3

    # instances plumbing
    inst = {'instances': [{'filepath': 'x.jpg'},
                          {'filepath': 'y.jpg'},
                          {'filepath': 'z.jpg'}]}
    files = wtu.split_instances_into_n_batches(
        inst, 2, output_files=[str(tmp_path / 'b0.json'),
                               str(tmp_path / 'b1.json')])
    shards = []
    for fn in files:
        with open(fn) as f:
            shards.append(json.load(f))
    assert sum(len(s['instances']) for s in shards) == 3

    pred_files = []
    for i, names in enumerate((['x.jpg'], ['y.jpg', 'z.jpg'])):
        fn = str(tmp_path / 'p{}.json'.format(i))
        with open(fn, 'w') as f:
            json.dump({'predictions': [{'filepath': n} for n in names]},
                      f)
        pred_files.append(fn)
    merged = wtu.merge_prediction_json_files(pred_files)
    assert len(merged['predictions']) == 3


def test_taxonomy_handler():
    from megadetector_tpu.utils.wi_taxonomy_utils import TaxonomyHandler

    handler = TaxonomyHandler([
        'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox',
        'u2;mammalia;carnivora;canidae;;;canidae family',
    ])
    s = handler.string_for_name('red fox')
    assert s.startswith('u1;')
    assert handler.string_for_name('vulpes vulpes') == s
    parent = handler.parent_string(s)
    assert parent.split(';')[5] == '' and 'vulpes' in parent
    chain = handler.ancestor_chain(s)
    assert len(chain) == 4  # genus, family, order, class


def test_coco_tools(tmp_path):
    from megadetector_tpu.data_management.coco_tools import (
        combine_cct_dictionaries, get_image_sizes,
        remap_coco_categories, resize_coco_dataset,
        threshold_coco_dataset)

    coco = {
        'images': [{'id': 'im1', 'file_name': 'a.jpg',
                    'width': 40, 'height': 30}],
        'annotations': [
            {'id': 'a1', 'image_id': 'im1', 'category_id': 1,
             'bbox': [4, 3, 10, 6], 'score': 0.9},
            {'id': 'a2', 'image_id': 'im1', 'category_id': 2,
             'bbox': [0, 0, 5, 5], 'score': 0.2}],
        'categories': [{'id': 1, 'name': 'deer'},
                       {'id': 2, 'name': 'fox'}],
    }

    t = threshold_coco_dataset(coco, confidence_threshold=0.5)
    assert len(t['annotations']) == 1

    r = remap_coco_categories(
        coco, {'animal': 0}, {'deer': 'animal', 'fox': 'animal'})
    assert all(a['category_id'] == 0 for a in r['annotations'])

    merged = combine_cct_dictionaries([
        {'images': [{'id': 'x', 'file_name': 'x.jpg'}],
         'annotations': [{'id': 'a', 'image_id': 'x',
                          'category_id': 0}],
         'categories': [{'id': 0, 'name': 'deer'}]},
        {'images': [{'id': 'x', 'file_name': 'y/x.jpg'}],
         'annotations': [{'id': 'a', 'image_id': 'x',
                          'category_id': 5}],
         'categories': [{'id': 5, 'name': 'deer'}]},
    ])
    assert len(merged['images']) == 2
    assert len(merged['categories']) == 1
    assert len({im['id'] for im in merged['images']}) == 2

    # resize: make a real image and shrink it
    img_dir = tmp_path / 'in'
    img_dir.mkdir()
    Image.fromarray(np.zeros((30, 40, 3), np.uint8)).save(
        str(img_dir / 'a.jpg'))
    out = resize_coco_dataset(str(img_dir), coco, str(tmp_path / 'out'),
                              target_size=(20, -1))
    assert out['images'][0]['width'] == 20
    assert out['images'][0]['height'] == 15
    ann = out['annotations'][0]
    assert ann['bbox'] == [2.0, 1.5, 5.0, 3.0]
    with Image.open(str(tmp_path / 'out' / 'a.jpg')) as im:
        assert im.size == (20, 15)

    sizes = get_image_sizes(['a.jpg', 'missing.jpg'],
                            image_prefix=str(img_dir))
    assert sizes['a.jpg'] == (40, 30) and sizes['missing.jpg'] is None


def test_image_file_tools(tmp_path):
    from megadetector_tpu.data_management.image_file_tools import (
        generate_crops_from_cct, remove_exif_from_image, rename_images)

    src = tmp_path / 'tree' / 'camA'
    src.mkdir(parents=True)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (30, 40, 3), np.uint8)).save(
        str(src / 'p1.jpg'))

    out = remove_exif_from_image(str(src / 'p1.jpg'),
                                 str(tmp_path / 'clean.jpg'))
    with Image.open(out) as im:
        assert not im.getexif()

    mapping = rename_images(str(tmp_path / 'tree'),
                            str(tmp_path / 'flat'))
    assert len(mapping) == 1
    out_name = list(mapping.values())[0]
    assert 'camA' in out_name and out_name.endswith('p1.jpg')
    assert os.path.isfile(str(tmp_path / 'flat' / out_name))

    cct = {
        'images': [{'id': 'im1', 'file_name': 'camA/p1.jpg'}],
        'annotations': [{'id': 'a1', 'image_id': 'im1',
                         'category_id': 0, 'bbox': [5, 5, 20, 15]}],
        'categories': [{'id': 0, 'name': 'deer'}],
    }
    crops = generate_crops_from_cct(cct, str(tmp_path / 'tree'),
                                    str(tmp_path / 'crops'))
    assert len(crops) == 1
    with Image.open(crops[0]) as im:
        assert im.size == (20, 15)


def test_ocr_datetime(tmp_path):
    from megadetector_tpu.data_management.ocr_tools import (
        crop_to_solid_region, datetime_string_to_datetime,
        get_datetime_from_image, make_rough_crops)

    assert datetime_string_to_datetime(
        'CAM01 2023-04-01 12:34:56 28C').hour == 12
    assert datetime_string_to_datetime(
        '04/01/2023 7:05').year == 2023
    assert datetime_string_to_datetime('no date here') is None

    # Image with a solid info bar at the bottom
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 200, 3)).astype(np.uint8)
    img[-8:] = 20  # solid dark bar
    crops = make_rough_crops(img)
    assert {c['location'] for c in crops} == {'top', 'bottom'}
    bottom = [c for c in crops if c['location'] == 'bottom'][0]
    solid, span = crop_to_solid_region(bottom)
    assert solid is not None and solid.shape[0] >= 4

    # Injectable OCR engine (tesseract is not installed here)
    dt, info = get_datetime_from_image(
        img, ocr_fn=lambda arr: '2024-02-29 23:59')
    assert dt is not None and dt.day == 29


def test_lila_reports(tmp_path):
    from megadetector_tpu.data_management.lila import lila_reports

    cct = {
        'images': [{'id': 'i{}'.format(k),
                    'file_name': 'i{}.jpg'.format(k)}
                   for k in range(10)],
        'annotations':
            [{'id': 'a{}'.format(k), 'image_id': 'i{}'.format(k),
              'category_id': 0 if k < 6 else 1} for k in range(10)],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'puma'}],
    }
    cct_file = str(tmp_path / 'ds.json')
    with open(cct_file, 'w') as f:
        json.dump(cct, f)

    entry = {'name': 'test_ds', 'metadata_path': cct_file,
             'image_base_url': 'https://example.com/imgs',
             'md_results_url': 'https://example.com/md.json'}
    index = {'test_ds': entry}

    counts = lila_reports.get_lila_annotation_counts(index)
    assert counts['test_ds'] == {'empty': 6, 'puma': 4}
    img_counts = lila_reports.get_lila_image_counts(index)
    assert img_counts['test_ds']['puma'] == 4

    picks = lila_reports.create_lila_test_set(
        entry, n_empty_per_dataset=2, n_non_empty_per_dataset=2)
    assert sum(1 for p in picks if p['is_empty']) == 2
    assert all(p['url'].startswith('https://example.com/imgs')
               for p in picks)

    blanks = lila_reports.create_lila_blank_set(
        index, n_blanks_per_dataset=3)
    assert len(blanks) == 3
    assert all(b['dataset'] == 'test_ds' for b in blanks)

    links = lila_reports.create_links_to_md_results_files(index)
    assert links['test_ds'].endswith('md.json')


def test_wi_download_csv_to_coco(tmp_path):
    from megadetector_tpu.data_management.wi_download_csv_to_coco \
        import wi_download_csv_to_coco

    csv_path = str(tmp_path / 'images.csv')
    with open(csv_path, 'w') as f:
        f.write('project_id,deployment_id,image_id,location,'
                'common_name,is_blank,timestamp\n')
        f.write('p1,dep1,g1,gs://bucket/x/g1.JPG,Red Fox,0,'
                '2023-01-01 10:00:00\n')
        f.write('p1,dep1,g2,gs://bucket/x/g2.JPG,Blank,1,'
                '2023-01-01 11:00:00\n')
        f.write('p1,dep2,g3,gs://bucket/x/g3.JPG,Human,0,'
                '2023-01-01 12:00:00\n')

    coco = wi_download_csv_to_coco(csv_path)
    assert len(coco['images']) == 3
    names = {c['name'] for c in coco['categories']}
    assert names == {'empty', 'red fox', 'human'}
    assert coco['images'][0]['file_name'].startswith('dep')

    no_blanks = wi_download_csv_to_coco(csv_path, include_blanks=False)
    assert len(no_blanks['images']) == 2


def test_cct_to_wi(tmp_path):
    from megadetector_tpu.data_management.cct_to_wi import cct_to_wi

    cct = {
        'info': {'description': 'test'},
        'images': [{'id': 'im1', 'file_name': 'camA/x.jpg',
                    'datetime': '2023-01-01 10:00:00'}],
        'annotations': [{'id': 'a1', 'image_id': 'im1',
                         'category_id': 1}],
        'categories': [{'id': 1, 'name': 'red fox'}],
    }
    taxonomy = {'red fox': {
        'common_name': 'Red Fox', 'wi_taxon_id': 'u1',
        'class': 'Mammalia', 'order': 'Carnivora',
        'family': 'Canidae', 'genus': 'Vulpes', 'species': 'vulpes'}}

    paths = cct_to_wi(cct, taxonomy, str(tmp_path / 'wi'),
                      project_info={'project_id': 'proj1'})
    assert all(os.path.isfile(p) for p in paths.values())
    images_csv = open(paths['images']).read()
    assert 'camA/x.jpg' in images_csv and 'Vulpes' in images_csv
    deployments_csv = open(paths['deployments']).read()
    assert 'camA' in deployments_csv


def test_top_folders_to_bottom(tmp_path):
    from megadetector_tpu.postprocessing.top_folders_to_bottom import (
        TopFoldersToBottomOptions, top_folders_to_bottom)

    src = tmp_path / 'in'
    (src / 'animal' / 'cam01').mkdir(parents=True)
    (src / 'animal' / 'cam01' / 'i1.jpg').write_bytes(b'x')
    (src / 'empty' / 'cam02').mkdir(parents=True)
    (src / 'empty' / 'cam02' / 'i2.jpg').write_bytes(b'y')

    options = TopFoldersToBottomOptions(str(src), str(tmp_path / 'out'))
    mapping = top_folders_to_bottom(options)
    assert mapping['animal/cam01/i1.jpg'] == 'cam01/animal/i1.jpg'
    assert os.path.isfile(
        str(tmp_path / 'out' / 'cam01' / 'animal' / 'i1.jpg'))


def test_analyze_classification_results(tmp_path):
    from megadetector_tpu.postprocessing \
        .analyze_classification_results import (
            ClassificationAnalysisOptions,
            analyze_classification_results)

    md = {
        'images': [
            {'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'classifications': [['0', 0.9]]}]},
            {'file': 'b.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'classifications': [['1', 0.8]]}]},
            {'file': 'c.jpg', 'detections': []},
        ],
        'classification_categories': {'0': 'deer', '1': 'fox'},
    }
    gt = {'a.jpg': 'deer', 'b.jpg': 'deer', 'c.jpg': 'empty'}

    options = ClassificationAnalysisOptions()
    options.md_results_file = md
    options.ground_truth = gt
    options.output_dir = str(tmp_path / 'analysis')
    results = analyze_classification_results(options)

    assert results['n_images_evaluated'] == 3
    assert abs(results['accuracy'] - 2 / 3) < 1e-3
    assert results['per_category']['deer']['recall'] == 0.5
    assert results['confusion_matrix']['deer']['fox'] == 1
    assert os.path.isfile(
        os.path.join(options.output_dir, 'index.html'))


def test_pr_curves_and_per_class(tmp_path):
    from megadetector_tpu.postprocessing.postprocess_batch_results \
        import _evaluate_against_ground_truth

    gt = {
        'images': [{'id': 'i1', 'file_name': 'a.jpg'},
                   {'id': 'i2', 'file_name': 'b.jpg'},
                   {'id': 'i3', 'file_name': 'c.jpg'}],
        'annotations': [
            {'id': 'a1', 'image_id': 'i1', 'category_id': 1},
            {'id': 'a2', 'image_id': 'i2', 'category_id': 0}],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'animal'}],
    }
    gt_file = str(tmp_path / 'gt.json')
    with open(gt_file, 'w') as f:
        json.dump(gt, f)

    md = {
        'images': [
            {'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
            {'file': 'b.jpg', 'detections': []},
            {'file': 'c.jpg', 'detections': [
                {'category': '1', 'conf': 0.3,
                 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        ],
        'detection_categories': {'1': 'animal'},
    }
    metrics = _evaluate_against_ground_truth(md, gt_file, 0.5)
    assert metrics['tp'] == 1 and metrics['tn'] == 2
    curve = metrics['precision_recall_curve']
    assert curve is not None
    assert curve['max_f1'] == 1.0
    per_class = metrics['per_class']
    assert 'animal' in per_class['classes']
    assert per_class['classes']['animal'][
        'threshold_at_target_recall'] is not None
    assert per_class['confusion_matrix']['animal']['animal'] == 1


def test_exiftool_backend_gating():
    from megadetector_tpu.data_management.read_exif import (
        ReadExifOptions, exiftool_available, read_exif_from_image)

    # exiftool is not installed in this environment; the backend must
    # fail gracefully rather than crash
    if not exiftool_available():
        options = ReadExifOptions()
        options.processing_library = 'exiftool'
        assert read_exif_from_image('/nonexistent.jpg', options) == {}
    else:  # pragma: no cover
        assert True
