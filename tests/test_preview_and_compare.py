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


def test_preview_option_parity(tmp_path):
    """The round-4 option sweep (reference PostProcessingOptions
    :78-265): bypass sets, sort order, links, pagination size, titles
    with extra fields and size ranges, job/model header strings, dict
    confidence thresholds, and the classification sort weights."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['a.jpg', 'b.jpg', 'c.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images = [
        {'file': 'a.jpg', 'datetime': '2024-01-01 10:00:00',
         'detections': [
             {'category': '1', 'conf': 0.9,
              'bbox': [0.1, 0.1, 0.2, 0.2],
              'classifications': [['0', 0.95]]},
             {'category': '1', 'conf': 0.85,
              'bbox': [0.4, 0.4, 0.1, 0.1],
              'classifications': [['1', 0.9]]}]},
        {'file': 'b.jpg', 'detections': []},
        # person at 0.5: above the person threshold (0.4) but below the
        # animal threshold (0.8) -- dict thresholds must classify this
        # as a person detection
        {'file': 'c.jpg', 'detections': [
            {'category': '2', 'conf': 0.5,
             'bbox': [0.2, 0.2, 0.2, 0.2]}]},
    ]
    data = _results(images)
    data['classification_categories'] = {'0': 'deer', '1': 'blank'}
    data['classification_category_descriptions'] = {
        '0': 'animalia;cervidae', '1': ''}
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, data)

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.parallelize_rendering = False
    options.confidence_threshold = {'animal': 0.8, 'person': 0.4,
                                    'default': 0.6}
    options.rendering_bypass_sets = ['non_detections']
    options.html_sort_order = 'confidence'
    options.max_figures_per_html_file = 1
    options.job_name_string = 'Test job 42'
    options.model_version_string = 'v5a.0.0'
    options.additional_image_fields_to_display = {
        'datetime': 'taken'}
    options.include_size_range = True
    options.category_name_to_sort_weight = {'blank': 1}
    options.include_category_descriptions_with_global_counts = True

    out = process_batch_results(options)
    cats = out.category_to_images
    assert len(cats['detections_animal']) == 1
    assert len(cats['detections_person']) == 1  # dict threshold applied
    assert len(cats['non_detections']) == 1

    html = open(out.output_html_file).read()
    assert 'Test job 42' in html
    assert 'v5a.0.0' in html
    # bypass set: counted on the index but no gallery page written
    assert 'non_detections: 1 images' in html.replace('\n', ' ') or \
        'non_detections' in html
    assert not os.path.isfile(
        os.path.join(options.output_dir, 'non_detections.html'))
    # classification report: 'blank' weighted to the bottom, with the
    # description column present
    assert 'animalia;cervidae' in html
    report = html[html.index('Classification categories'):]
    assert report.index('deer') < report.index('blank')

    page = open(os.path.join(options.output_dir,
                             'detections_animal.html')).read()
    assert 'taken: 2024-01-01 10:00:00' in page
    assert 'size 0.0' in page            # size range in the title
    assert 'href=' in page               # link back to the original


def test_preview_filename_replacements_and_gt_classes(tmp_path):
    """api_output_filename_replacements re-root results paths;
    negative/unlabeled GT classes control P/R inclusion."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['new_root/a.jpg', 'new_root/b.jpg', 'new_root/u.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images = [
        {'file': 'old_root/a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'old_root/b.jpg', 'detections': []},
        # annotated only 'unidentifiable': excluded from P/R
        {'file': 'old_root/u.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ]
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, _results(images))

    gt = {
        'images': [{'id': fn, 'file_name': fn}
                   for fn in ['new_root/a.jpg', 'new_root/b.jpg',
                              'new_root/u.jpg']],
        'annotations': [
            {'id': 0, 'image_id': 'new_root/a.jpg', 'category_id': 1},
            {'id': 1, 'image_id': 'new_root/u.jpg', 'category_id': 2},
        ],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'deer'},
                       {'id': 2, 'name': 'unidentifiable'}],
    }
    gt_file = str(tmp_path / 'gt.json')
    ct_utils.write_json(gt_file, gt)

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.parallelize_rendering = False
    options.api_output_filename_replacements = {'old_root': 'new_root'}
    options.ground_truth_json_file = gt_file

    out = process_batch_results(options)
    m = out.eval_metrics
    # a: TP; b: unannotated -> negative via #NO_LABELS# default -> TN;
    # u: unknown-class only -> excluded
    assert m['tp'] == 1 and m['tn'] == 1
    assert m['fp'] == 0 and m['fn'] == 0
    assert m['n_unknown'] == 1

    # Without the #NO_LABELS# token, unannotated images are excluded
    options2 = PostProcessingOptions()
    options2.md_results_file = results_file
    options2.output_dir = str(tmp_path / 'preview2')
    options2.image_base_dir = image_base
    options2.parallelize_rendering = False
    options2.api_output_filename_replacements = {'old_root': 'new_root'}
    options2.ground_truth_json_file = gt_file
    options2.negative_classes = ['empty']
    out2 = process_batch_results(options2)
    assert out2.eval_metrics['tn'] == 0
    assert out2.eval_metrics['n_unknown'] == 2


def test_preview_process_pool_rendering(tmp_path):
    """parallelize_rendering_with_threads=False renders via processes
    (options and jobs must pickle)."""

    from megadetector_tpu.postprocessing.postprocess_batch_results import (
        PostProcessingOptions, process_batch_results)

    files = ['a.jpg', 'b.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)
    images = [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'b.jpg', 'detections': []},
    ]
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, _results(images))

    options = PostProcessingOptions()
    options.md_results_file = results_file
    options.output_dir = str(tmp_path / 'preview')
    options.image_base_dir = image_base
    options.parallelize_rendering = True
    options.parallelize_rendering_with_threads = False
    options.parallelize_rendering_n_cores = 2
    out = process_batch_results(options)
    rendered = os.listdir(os.path.join(options.output_dir, 'rendered'))
    assert len(rendered) == 2
    assert os.path.isfile(out.output_html_file)


def _write_results(path, images, cats=None):
    data = {'images': images,
            'detection_categories': cats or {'1': 'animal', '2': 'person',
                                             '3': 'vehicle'},
            'info': {'format_version': '1.6'}}
    ct_utils.write_json(str(path), data)
    return str(path)


def test_compare_option_parity(tmp_path):
    """Round-4 compare options: filters, class-agnostic comparison,
    confidence sort, pagination, colormaps, process rendering."""

    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, compare_batch_results)

    files = ['a.jpg', 'b.jpg', 'c.jpg', 'd.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images_a = [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'b.jpg', 'detections': [
            {'category': '2', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'c.jpg', 'detections': []},
        {'file': 'd.jpg', 'detections': [
            {'category': '3', 'conf': 0.7, 'bbox': [0.3, 0.3, 0.2, 0.2]}]},
    ]
    # b: same box, different category -> class transition normally,
    # common under class_agnostic
    images_b = [
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.88, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'b.jpg', 'detections': [
            {'category': '1', 'conf': 0.8, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'c.jpg', 'detections': []},
        {'file': 'd.jpg', 'detections': [
            {'category': '3', 'conf': 0.7, 'bbox': [0.3, 0.3, 0.2, 0.2]}]},
    ]
    file_a = _write_results(tmp_path / 'a.json', images_a)
    file_b = _write_results(tmp_path / 'b.json', images_b)

    options = BatchComparisonOptions()
    options.results_filename_a = file_a
    options.results_filename_b = file_b
    comparison = compare_batch_results(options)
    assert 'class_transitions' in comparison.categories_to_image_files
    assert comparison.file_to_sort_conf['a.jpg'] == pytest.approx(0.9)

    # class-agnostic: the transition becomes a common detection
    options2 = BatchComparisonOptions()
    options2.results_filename_a = file_a
    options2.results_filename_b = file_b
    options2.class_agnostic_comparison = True
    c2 = compare_batch_results(options2)
    assert 'class_transitions' not in c2.categories_to_image_files
    assert 'b.jpg' in c2.categories_to_image_files['common_detections']

    # filename filters
    options3 = BatchComparisonOptions()
    options3.results_filename_a = file_a
    options3.results_filename_b = file_b
    options3.filenames_to_include = ['a.jpg', 'b.jpg']
    c3 = compare_batch_results(options3)
    all_files = [fn for v in c3.categories_to_image_files.values()
                 for fn in v]
    assert sorted(all_files) == ['a.jpg', 'b.jpg']

    options4 = BatchComparisonOptions()
    options4.results_filename_a = file_a
    options4.results_filename_b = file_b
    options4.required_token = 'd.'
    c4 = compare_batch_results(options4)
    all_files = [fn for v in c4.categories_to_image_files.values()
                 for fn in v]
    assert all_files == ['d.jpg']

    # category restriction: only 'vehicle' counts -> a/b become common
    # non-detections
    options5 = BatchComparisonOptions()
    options5.results_filename_a = file_a
    options5.results_filename_b = file_b
    options5.category_names_to_include = ['vehicle']
    c5 = compare_batch_results(options5)
    assert sorted(c5.categories_to_image_files[
        'common_non_detections']) == ['a.jpg', 'b.jpg', 'c.jpg']

    # rendering: confidence sort + pagination + process pool
    options6 = BatchComparisonOptions()
    options6.results_filename_a = file_a
    options6.results_filename_b = file_b
    options6.output_folder = str(tmp_path / 'cmp')
    options6.image_folder = image_base
    options6.sort_by_confidence = True
    options6.max_images_per_page = 1
    options6.parallelize_rendering = True
    options6.parallelize_rendering_with_threads = False
    options6.parallelize_rendering_n_cores = 2
    c6 = compare_batch_results(options6)
    assert os.path.isfile(c6.html_output_file)
    # class_transitions page (1 image) unpaginated; detections pages
    # with >1 image would paginate -- common_detections has 2 images
    # (a.jpg + d.jpg)
    cd_page = os.path.join(options6.output_folder,
                           'common_detections.html')
    assert os.path.isfile(cd_page)
    assert os.path.isfile(os.path.join(
        options6.output_folder, 'common_detections_page000.html'))
    page0 = open(os.path.join(
        options6.output_folder, 'common_detections_page000.html')).read()
    # confidence sort: a.jpg (0.9) before d.jpg (0.7) -> page000 shows a
    assert 'a.jpg' in page0


def test_compare_with_box_ground_truth(tmp_path):
    """GT-based comparison: categories become TP/TN/FP/FN agreement
    pages; box-level GT matches by IoU."""

    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, compare_batch_results)

    files = ['tp.jpg', 'tn.jpg', 'win_a.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files, size=(100, 100))

    box = [0.1, 0.1, 0.2, 0.2]
    images_a = [
        {'file': 'tp.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
        {'file': 'tn.jpg', 'detections': []},
        {'file': 'win_a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': box}]},
    ]
    images_b = [
        {'file': 'tp.jpg', 'detections': [
            {'category': '1', 'conf': 0.85, 'bbox': box}]},
        {'file': 'tn.jpg', 'detections': []},
        {'file': 'win_a.jpg', 'detections': []},  # B misses -> FN
    ]
    file_a = _write_results(tmp_path / 'a.json', images_a)
    file_b = _write_results(tmp_path / 'b.json', images_b)

    # GT: tp.jpg and win_a.jpg contain an animal at the same box;
    # tn.jpg is empty. GT categories must match detection categories
    # by name for class-sensitive comparison.
    gt = {
        'images': [
            {'id': 'tp', 'file_name': 'tp.jpg', 'width': 100,
             'height': 100},
            {'id': 'tn', 'file_name': 'tn.jpg', 'width': 100,
             'height': 100},
            {'id': 'wa', 'file_name': 'win_a.jpg', 'width': 100,
             'height': 100},
        ],
        'annotations': [
            {'id': 0, 'image_id': 'tp', 'category_id': 10,
             'bbox': [10, 10, 20, 20]},
            {'id': 1, 'image_id': 'wa', 'category_id': 10,
             'bbox': [10, 10, 20, 20]},
        ],
        'categories': [{'id': 10, 'name': 'animal'}],
    }

    options = BatchComparisonOptions()
    options.results_filename_a = file_a
    options.results_filename_b = file_b
    options.ground_truth_file = gt
    options.error_on_non_matching_lists = False
    options.output_folder = str(tmp_path / 'cmp_gt')
    options.image_folder = image_base
    c = compare_batch_results(options)

    cats = c.categories_to_image_files
    assert cats['common_tp'] == ['tp.jpg']
    assert cats['common_tn'] == ['tn.jpg']
    assert cats['tp_a_only'] == ['win_a.jpg']
    # GT boxes rendered onto both panels
    rendered = os.path.join(options.output_folder, 'rendered',
                            'common_tp')
    assert len(os.listdir(rendered)) == 2


def test_compare_with_image_level_ground_truth(tmp_path):
    """Image-level GT (no boxes): category-name presence comparison,
    empty categories, and the GT label line on pages."""

    from megadetector_tpu.postprocessing.compare_batch_results import (
        BatchComparisonOptions, compare_batch_results)

    files = ['x.jpg', 'y.jpg']
    image_base = str(tmp_path / 'images')
    _build_image_tree(image_base, files)

    images_a = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'y.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ]
    images_b = [
        {'file': 'x.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'y.jpg', 'detections': []},
    ]
    file_a = _write_results(tmp_path / 'a.json', images_a)
    file_b = _write_results(tmp_path / 'b.json', images_b)

    gt = {
        'images': [{'id': 'x', 'file_name': 'x.jpg'},
                   {'id': 'y', 'file_name': 'y.jpg'}],
        'annotations': [
            {'id': 0, 'image_id': 'x', 'category_id': 1},
            {'id': 1, 'image_id': 'y', 'category_id': 0},
        ],
        'categories': [{'id': 0, 'name': 'empty'},
                       {'id': 1, 'name': 'animal'}],
    }

    options = BatchComparisonOptions()
    options.results_filename_a = file_a
    options.results_filename_b = file_b
    options.ground_truth_file = gt
    options.output_folder = str(tmp_path / 'cmp_gt')
    options.image_folder = image_base
    c = compare_batch_results(options)

    cats = c.categories_to_image_files
    assert cats['common_tp'] == ['x.jpg']
    # y: A has an FP on an empty image, B a TN -> tn_b_only
    assert cats['tn_b_only'] == ['y.jpg']
    page = open(os.path.join(options.output_folder,
                             'common_tp.html')).read()
    assert 'Ground truth: animal' in page
