"""Tests for HTML previews, result comparison, and the HTML gallery util."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.utils import ct_utils


def _build_image_tree(base, files, size=(40, 60)):
    rng = np.random.RandomState(0)
    for fn in files:
        p = os.path.join(base, fn)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (size[0], size[1], 3),
                                    dtype=np.uint8)).save(p)


def _results(images):
    return {'images': images,
            'detection_categories': {'1': 'animal', '2': 'person',
                                     '3': 'vehicle'},
            'info': {'format_version': '1.6',
                     'detector_metadata': {
                         'typical_detection_threshold': 0.2}}}


def test_write_html_image_list(tmp_path):
    from megadetector_tpu.utils.write_html_image_list import \
        write_html_image_list
    out = str(tmp_path / 'gallery.html')
    write_html_image_list(out, [
        'img1.jpg',
        {'filename': 'img2.jpg', 'title': 'second image',
         'linkTarget': 'img2_full.jpg'},
    ])
    html = open(out).read()
    assert 'img1.jpg' in html
    assert 'second image' in html
    assert 'img2_full.jpg' in html


def test_write_html_image_list_pagination(tmp_path):
    from megadetector_tpu.utils.write_html_image_list import \
        write_html_image_list
    out = str(tmp_path / 'gallery.html')
    images = ['img{}.jpg'.format(i) for i in range(10)]
    files = write_html_image_list(out, images,
                                  {'maxFiguresPerHtmlFile': 4})
    assert len(files) == 4  # index + 3 pages
    assert all(os.path.isfile(f) for f in files)


def test_process_batch_results(tmp_path):
    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['cam1/a.jpg', 'cam1/b.jpg', 'cam2/c.jpg', 'cam2/d.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images = [
        {'file': 'cam1/a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'cam1/b.jpg', 'detections': []},
        {'file': 'cam2/c.jpg', 'detections': [
            {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            {'category': '2', 'conf': 0.7, 'bbox': [0.5, 0.5, 0.2, 0.2]}]},
        {'file': 'cam2/d.jpg', 'detections': [
            {'category': '1', 'conf': 0.15,
             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ]
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, _results(images))

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.include_almost_detections = True
    options.num_images_to_sample = 10
    options.parallelize_rendering = False

    out = process_batch_results(options)
    assert os.path.isfile(out.output_html_file)
    cats = out.category_to_images
    assert len(cats['detections_animal']) == 1
    assert len(cats['multiple categories']) == 1
    assert len(cats['non_detections']) == 1
    assert len(cats['almost_detections']) == 1
    html = open(out.output_html_file).read()
    assert 'detections_animal' in html


def test_process_batch_results_with_ground_truth(tmp_path):
    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['a.jpg', 'b.jpg', 'c.jpg', 'd.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    # a: TP, b: TN, c: FP, d: FN
    images = [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'b.jpg', 'detections': []},
        {'file': 'c.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'd.jpg', 'detections': []},
    ]
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, _results(images))

    gt = {
        'images': [{'id': fn, 'file_name': fn} for fn in files],
        'annotations': [
            {'id': 0, 'image_id': 'a.jpg', 'category_id': 1},
            {'id': 1, 'image_id': 'b.jpg', 'category_id': 0},
            {'id': 2, 'image_id': 'c.jpg', 'category_id': 0},
            {'id': 3, 'image_id': 'd.jpg', 'category_id': 1},
        ],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'deer'}],
    }
    gt_file = str(tmp_path / 'gt.json')
    ct_utils.write_json(gt_file, gt)

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.ground_truth_json_file = gt_file
    options.parallelize_rendering = False

    out = process_batch_results(options)
    m = out.eval_metrics
    assert m['tp'] == 1 and m['tn'] == 1 and m['fp'] == 1 and m['fn'] == 1
    assert m['precision'] == 0.5 and m['recall'] == 0.5


def test_compare_batch_results(tmp_path):
    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, compare_batch_results)

    box = [0.1, 0.1, 0.2, 0.2]
    images_a = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []},
        {'file': 'z.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
        {'file': 'w.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
    ]
    images_b = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.85, 'bbox': box}]},  # agree
        {'file': 'y.jpg', 'detections': []},                  # agree empty
        {'file': 'z.jpg', 'detections': []},                  # a only
        {'file': 'w.jpg', 'detections': [
            {'category': '2', 'conf': 0.9, 'bbox': box}]},    # class change
    ]
    file_a = str(tmp_path / 'a.json')
    file_b = str(tmp_path / 'b.json')
    ct_utils.write_json(file_a, _results(images_a))
    ct_utils.write_json(file_b, _results(images_b))

    options = BatchComparisonOptions()
    options.results_filename_a = file_a
    options.results_filename_b = file_b
    options.output_folder = str(tmp_path / 'cmp')

    out = compare_batch_results(options)
    cats = out.categories_to_image_files
    assert cats['common_detections'] == ['x.jpg']
    assert cats['common_non_detections'] == ['y.jpg']
    assert cats['detections_a_only'] == ['z.jpg']
    assert cats['class_transitions'] == ['w.jpg']
    assert os.path.isfile(out.html_output_file)


def test_find_equivalent_threshold(tmp_path):
    from megadetector_tpu.postprocessing.compare_batch_results import (
        find_equivalent_threshold)

    # Model A marks 2 of 4 images positive at 0.5; model B's confidences
    # are shifted down: equivalent threshold should mark the same count
    def file_with_confs(confs, name):
        images = [{'file': 'im{}.jpg'.format(i), 'detections': [
            {'category': '1', 'conf': c, 'bbox': [0.1, 0.1, 0.2, 0.2]}]}
            for i, c in enumerate(confs)]
        p = str(tmp_path / name)
        ct_utils.write_json(p, _results(images))
        return p

    file_a = file_with_confs([0.9, 0.7, 0.3, 0.1], 'a.json')
    file_b = file_with_confs([0.6, 0.45, 0.2, 0.05], 'b.json')
    t = find_equivalent_threshold(file_a, file_b, 0.5)
    assert t == pytest.approx(0.45)


def test_preview_renders_classifications(tmp_path):
    """Two-stage results: class labels must land in the preview —
    class_<name> gallery pages, index report, and titles (VERDICT
    round-2 item 3; reference postprocess_batch_results.py:905-937)."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['a.jpg', 'b.jpg', 'c.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images = [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['10', 0.95], ['11', 0.03]]}]},
        {'file': 'b.jpg', 'detections': [
            {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['11', 0.2]]}]},  # below class threshold
        {'file': 'c.jpg', 'detections': []},
    ]
    data = _results(images)
    data['classification_categories'] = {'10': 'deer', '11': 'bear'}
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, data)

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.num_images_to_sample = 10
    options.parallelize_rendering = False

    out = process_batch_results(options)
    cats = out.category_to_images
    assert [im['file'] for im in cats['class_deer']] == ['a.jpg']
    assert [im['file'] for im in cats['class_unreliable']] == ['b.jpg']

    index_html = open(out.output_html_file).read()
    assert 'class_deer' in index_html
    assert 'Classification categories' in index_html

    page = os.path.join(options.output_dir, 'class_deer.html')
    assert os.path.isfile(page)
    assert 'deer' in open(page).read()
    # The class page gallery title carries the species name
    det_page = os.path.join(options.output_dir,
                            'detections_animal.html')
    assert 'deer' in open(det_page).read()


def test_compare_renders_side_by_side(tmp_path):
    """Comparison pages must contain rendered A/B image pairs (VERDICT
    round-2 item 4; reference compare_batch_results.py:626-1627)."""

    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, compare_batch_results)

    files = ['x.jpg', 'y.jpg', 'z.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    box = [0.1, 0.1, 0.2, 0.2]
    images_a = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []},
        {'file': 'z.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
    ]
    images_b = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.85, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []},
        {'file': 'z.jpg', 'detections': []},
    ]
    file_a = str(tmp_path / 'a.json')
    file_b = str(tmp_path / 'b.json')
    ct_utils.write_json(file_a, _results(images_a))
    ct_utils.write_json(file_b, _results(images_b))

    options = BatchComparisonOptions()
    options.results_filename_a = file_a
    options.results_filename_b = file_b
    options.output_folder = str(tmp_path / 'cmp')
    options.image_folder = image_base

    out = compare_batch_results(options)
    assert os.path.isfile(out.html_output_file)

    # Each agreement page holds one rendered pair per sampled image
    page = os.path.join(options.output_folder,
                        'detections_a_only.html')
    html = open(page).read()
    assert html.count('<img') == 2  # A and B renderings of z.jpg
    rendered = os.path.join(options.output_folder, 'rendered',
                            'detections_a_only')
    jpgs = sorted(os.listdir(rendered))
    assert len(jpgs) == 2
    assert any('_A_' in f for f in jpgs)
    assert any('_B_' in f for f in jpgs)
    # Page names both models with their detection summaries
    assert 'a.json' in html and 'b.json' in html
    assert 'max conf' in html

def test_preview_failures_render_and_single_pass(tmp_path):
    """Failed images must get a real (or placeholder) thumbnail rather
    than a broken link, and an image on multiple pages must render only
    once (review-batch-4 findings 5 and 10)."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['ok.jpg', 'readable_fail.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)
    # An image that failed inference AND is unreadable on disk
    with open(os.path.join(image_base, 'corrupt_fail.jpg'), 'wb') as f:
        f.write(b'not a jpeg')

    images = [
        {'file': 'ok.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2],
             'classifications': [['10', 0.95]]}]},
        {'file': 'readable_fail.jpg', 'detections': None,
         'failure': 'inference failure'},
        {'file': 'corrupt_fail.jpg', 'detections': None,
         'failure': 'image access failure'},
    ]
    data = _results(images)
    data['classification_categories'] = {'10': 'deer'}
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, data)

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.parallelize_rendering = False

    out = process_batch_results(options)
    assert len(out.category_to_images['failures']) == 2

    # Every referenced thumbnail exists (placeholder for the corrupt one)
    failures_html = open(os.path.join(
        options.output_dir, 'failures.html')).read()
    import re
    for m in re.finditer(r'src="([^"]+)"', failures_html):
        assert os.path.isfile(os.path.join(options.output_dir, m.group(1)))
    assert 'image access failure' in failures_html

    # ok.jpg is on detections_animal AND class_deer but renders once,
    # into the shared rendered/ folder
    rendered = os.listdir(os.path.join(options.output_dir, 'rendered'))
    assert sum(1 for f in rendered if 'ok.jpg' in f) == 1
    det_html = open(os.path.join(
        options.output_dir, 'detections_animal.html')).read()
    cls_html = open(os.path.join(
        options.output_dir, 'class_deer.html')).read()
    src_det = re.search(r'src="([^"]+)"', det_html).group(1)
    src_cls = re.search(r'src="([^"]+)"', cls_html).group(1)
    assert src_det == src_cls


def test_confusion_matrix_respects_threshold(tmp_path):
    """Sub-threshold detections must not count as predictions in the
    confusion matrix (review-batch-4 finding 3)."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        compute_per_class_metrics)

    # One truly-empty image whose only detection is sub-noise junk
    md_data = _results([
        {'file': 'junk.jpg', 'detections': [
            {'category': '1', 'conf': 0.02,
             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'real.jpg', 'detections': [
            {'category': '1', 'conf': 0.9,
             'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ])
    gt = {
        'images': [{'id': 'junk.jpg', 'file_name': 'junk.jpg'},
                   {'id': 'real.jpg', 'file_name': 'real.jpg'}],
        'annotations': [
            {'id': 0, 'image_id': 'junk.jpg', 'category_id': 0},
            {'id': 1, 'image_id': 'real.jpg', 'category_id': 1},
        ],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'animal'}],
    }
    out = compute_per_class_metrics(md_data, gt,
                                    confusion_threshold=0.2)
    cm = out['confusion_matrix']
    assert cm['empty'].get('empty', 0) == 1
    assert cm['empty'].get('animal', 0) == 0
    assert cm['animal'].get('animal', 0) == 1


def test_compare_batch_results_pairwise_options_shape(tmp_path):
    """The reference's multi-comparison API shape
    (compare_batch_results.py:77-286,1627-1766): pairwise_options lists,
    BatchComparisonResults, n_way_comparison, and
    find_image_level_detections_above_threshold."""

    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, BatchComparisonResults,
        PairwiseBatchComparisonOptions, compare_batch_results,
        find_image_level_detections_above_threshold, n_way_comparison)

    box = [0.1, 0.1, 0.2, 0.2]

    def file_with(images, name):
        p = str(tmp_path / name)
        ct_utils.write_json(p, _results(images))
        return p

    file_a = file_with([
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []}], 'a.json')
    file_b = file_with([
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.85, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []}], 'b.json')
    file_c = file_with([
        {'file': 'x.jpg', 'detections': [
            {'category': '2', 'conf': 0.4, 'bbox': box}]},
        {'file': 'y.jpg', 'detections': []}], 'c.json')

    # Multi-pair mode through pairwise_options
    options = BatchComparisonOptions()
    options.output_folder = str(tmp_path / 'cmp_multi')
    pair_1 = PairwiseBatchComparisonOptions()
    pair_1.results_filename_a = file_a
    pair_1.results_filename_b = file_b
    pair_2 = PairwiseBatchComparisonOptions()
    pair_2.results_filename_a = file_a
    pair_2.results_filename_b = file_c
    pair_2.results_description_a = 'model A'
    pair_2.results_description_b = 'model C'
    options.pairwise_options = [pair_1, pair_2]

    results = compare_batch_results(options)
    assert isinstance(results, BatchComparisonResults)
    assert len(results.pairwise_results) == 2
    assert os.path.isfile(results.html_output_file)
    assert results.pairwise_results[0].comparison_short_name == 'pair_00'
    assert results.pairwise_results[1].comparison_friendly_name == \
        'model A vs model C'
    assert 'common_detections' in \
        results.pairwise_results[0].categories_to_image_files
    for p in results.pairwise_results:
        assert os.path.isfile(p.html_output_file)
    index_html = open(results.html_output_file).read()
    assert 'model A vs model C' in index_html

    # n_way_comparison returns BatchComparisonResults over all pairs
    options = BatchComparisonOptions()
    options.output_folder = None
    nway = n_way_comparison([file_a, file_b, file_c], options,
                            model_names=['ma', 'mb', 'mc'])
    assert isinstance(nway, BatchComparisonResults)
    assert len(nway.pairwise_results) == 3
    # Default rendering thresholds derive from detection thresholds
    assert nway.pairwise_results[0].pairwise_options.\
        rendering_confidence_threshold_a == pytest.approx(0.15 * 0.6666)

    # find_image_level_detections_above_threshold: filename or dict,
    # category filtering by name
    ims = find_image_level_detections_above_threshold(file_c,
                                                      threshold=0.2)
    assert [im['file'] for im in ims] == ['x.jpg']
    ims = find_image_level_detections_above_threshold(
        file_c, threshold=0.2, category_names='animal')
    assert ims == []
    ims = find_image_level_detections_above_threshold(
        json.load(open(file_c)), threshold=0.2,
        category_names=['person'])
    assert [im['file'] for im in ims] == ['x.jpg']
    with pytest.raises(AssertionError):
        find_image_level_detections_above_threshold(
            file_c, category_names='no-such-category')
