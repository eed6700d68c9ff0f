"""Tests for the two-stage classification pipeline and postprocessing."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from megadetector_tpu.models import efficientnet
from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import ct_utils


@pytest.fixture(scope='module')
def tiny_classifier(tmp_path_factory):
    folder = tmp_path_factory.mktemp('classifier')
    cfg = efficientnet.EfficientNetConfig('efficientnetv2_s',
                                          num_classes=4)
    params = efficientnet.init_params(cfg, seed=3)
    path = str(folder / 'classifier.npz')
    save_checkpoint(params, path, {
        'arch': 'efficientnetv2_s',
        'num_classes': 4,
        'class_names': ['deer', 'fox', 'cow', 'other'],
        'image_size': 64,
    })
    return path


@pytest.fixture(scope='module')
def tiny_detector(tmp_path_factory):
    folder = tmp_path_factory.mktemp('detector')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(folder / 'detector.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist(),
    })
    return path


def test_classify_batch_pad_to(tiny_classifier):
    """pad_to pads tail batches up to one compiled size; results must
    equal running the same crops through the full-size program manually
    (same program, so bit-identical), trimmed to N. Comparing against
    the UNpadded 3-crop program instead would be wrong-headed: that is
    a different XLA program, and random-init nets amplify f32
    reduction-order differences into argmax flips."""

    from megadetector_tpu.models.classifier import SpeciesClassifier
    classifier = SpeciesClassifier(tiny_classifier)
    rng = np.random.RandomState(1)
    crops = [rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
             for _ in range(3)]
    padded = classifier.classify_batch(crops, pad_to=8)
    assert padded.shape == (3, 4)
    # one program exists, at the padded size (no tail-size compile)
    assert list(classifier._compiled.keys()) == [8]
    # manual reference through the same 8-wide program
    s = classifier.image_size
    zero = np.zeros((s, s, 3), np.uint8)
    manual = classifier.classify_batch(
        [classifier.preprocess_crop(c) for c in crops] + [zero] * 5)
    assert list(classifier._compiled.keys()) == [8]
    np.testing.assert_array_equal(padded, manual[:3])
    # pad_to smaller than the batch is a no-op
    same = classifier.classify_batch(crops, pad_to=2)
    assert same.shape == (3, 4)


def test_classifier_batch(tiny_classifier):
    from megadetector_tpu.models.classifier import SpeciesClassifier
    classifier = SpeciesClassifier(tiny_classifier)
    rng = np.random.RandomState(0)
    crops = [rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
             for _ in range(3)]
    probs = classifier.classify_batch(crops)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    top = classifier.top_k(probs[0], k=2)
    assert len(top) == 2
    assert top[0][1] >= top[1][1]


@pytest.mark.parametrize('mode', ['w2', 'w4'])
def test_fold_stem_exact(mode):
    """fold_stem rewrites the stem kernel into the width-folded layout
    with identical multiply-accumulate terms: stem output and full
    forward match the unfolded graph exactly on CPU (same dtype, same
    reduction structure per output element)."""

    import jax.numpy as jnp
    cfg = efficientnet.EfficientNetConfig('efficientnetv2_test',
                                          num_classes=5)
    params = efficientnet.init_params(cfg, seed=1)
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    folded = efficientnet.fold_stem(params, mode=mode)
    assert efficientnet.stem_is_folded(folded)
    assert not efficientnet.stem_is_folded(params)

    stem_base = np.asarray(efficientnet._stem_conv(
        params['stem'], jnp.asarray(x)))
    stem_fold = np.asarray(efficientnet._stem_conv(
        folded['stem'], jnp.asarray(x)))
    assert stem_fold.shape == stem_base.shape
    np.testing.assert_array_equal(stem_fold, stem_base)

    out_base = np.asarray(efficientnet.apply(cfg, params, x))
    out_fold = np.asarray(efficientnet.apply(cfg, folded, x))
    np.testing.assert_array_equal(out_fold, out_base)

    # Double-folding is rejected
    with pytest.raises(AssertionError):
        efficientnet.fold_stem(folded, mode=mode)


def test_classifier_folded_stem_option(tiny_classifier):
    """The folded_stem classifier option folds at load (default auto
    -> w4 at image_size 64) and classifies identically to off."""

    from megadetector_tpu.models.classifier import SpeciesClassifier
    rng = np.random.RandomState(2)
    crops = [rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
             for _ in range(3)]

    clf_off = SpeciesClassifier(tiny_classifier,
                                {'folded_stem': 'off'})
    clf_auto = SpeciesClassifier(tiny_classifier)
    assert efficientnet.stem_is_folded(
        {'stem': {'w': np.asarray(clf_auto.params['stem']['w'])}})
    probs_off = clf_off.classify_batch(crops)
    probs_auto = clf_auto.classify_batch(crops)
    assert probs_auto.shape == probs_off.shape
    assert (probs_auto.argmax(axis=1) == probs_off.argmax(axis=1)).all()
    np.testing.assert_allclose(probs_auto, probs_off, atol=2e-3)

    with pytest.raises(ValueError):
        SpeciesClassifier(tiny_classifier, {'folded_stem': 'bogus'})


def test_classify_batch_async_matches_sync(tiny_classifier):
    """classify_batch_async + fetch_batch runs the SAME compiled
    program as classify_batch (bit-identical), and two handles can be
    in flight at once (the pipelined-consumer discipline)."""

    from megadetector_tpu.models.classifier import SpeciesClassifier
    classifier = SpeciesClassifier(tiny_classifier)
    rng = np.random.RandomState(5)
    batch_a = [rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
               for _ in range(3)]
    batch_b = [rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
               for _ in range(2)]

    sync_a = classifier.classify_batch(batch_a, pad_to=4)
    sync_b = classifier.classify_batch(batch_b, pad_to=4)

    # Dispatch both before fetching either (one-in-flight rotation)
    h_a = classifier.classify_batch_async(batch_a, pad_to=4)
    h_b = classifier.classify_batch_async(batch_b, pad_to=4)
    np.testing.assert_array_equal(classifier.fetch_batch(h_a), sync_a)
    np.testing.assert_array_equal(classifier.fetch_batch(h_b), sync_b)

    # Empty-batch handle round-trips to an empty result
    empty = classifier.fetch_batch(classifier.classify_batch_async([]))
    assert empty.shape == (0, 4)


def test_consume_crop_queue_pipelined(tiny_classifier):
    """_consume_crop_queue with multiple flushes (the in-flight
    rotation) classifies every det exactly once, identical to direct
    classify_batch calls on the same batches."""

    import queue as queue_mod
    from megadetector_tpu.detection.run_md_and_classifier import (
        MDAndClassifierOptions, _consume_crop_queue)
    from megadetector_tpu.models.classifier import SpeciesClassifier

    classifier = SpeciesClassifier(tiny_classifier)
    options = MDAndClassifierOptions()
    options.classifier_batch_size = 2
    options.top_k_classifications = 2

    rng = np.random.RandomState(9)
    crops = [rng.randint(0, 255, (48, 40, 3), dtype=np.uint8)
             for _ in range(5)]  # 2 full batches + tail of 1
    dets = [{'category': '1', 'conf': 0.9, 'bbox': [0, 0, 1, 1]}
            for _ in crops]

    crop_q = queue_mod.Queue()
    for det, crop in zip(dets, crops):
        crop_q.put((det, crop))
    crop_q.put(None)

    n = _consume_crop_queue(crop_q, 1, classifier, options)
    assert n == 5
    assert all('classifications' in det for det in dets)

    # Reference: the same batches through the sync API
    for batch_start, det_batch, crop_batch in (
            (0, dets[0:2], crops[0:2]),
            (2, dets[2:4], crops[2:4]),
            (4, dets[4:5], crops[4:5])):
        probs = classifier.classify_batch(crop_batch, pad_to=2)
        for det, p in zip(det_batch, probs):
            expected = classifier.top_k(p, k=2)
            assert det['classifications'] == expected


def test_extract_crop():
    from megadetector_tpu.models.classifier import extract_crop
    img = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    crop = extract_crop(img, [0.25, 0.2, 0.5, 0.6])
    assert crop.shape == (60, 100, 3)
    # Expansion grows the crop
    crop_e = extract_crop(img, [0.25, 0.2, 0.5, 0.6], expansion=0.1)
    assert crop_e.shape[0] > 60 and crop_e.shape[1] > 100
    # Square mode equalizes sides (within clamping)
    crop_s = extract_crop(img, [0.4, 0.4, 0.2, 0.1], square=True)
    assert abs(crop_s.shape[0] - crop_s.shape[1]) <= 1


def test_two_stage_pipeline(tiny_detector, tiny_classifier, tmp_path):
    from megadetector_tpu.detection.run_md_and_classifier import (
        MDAndClassifierOptions, run_md_and_classifier)

    input_folder = str(tmp_path / 'images')
    os.makedirs(input_folder)
    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                    dtype=np.uint8)).save(
            os.path.join(input_folder, 'im{}.jpg'.format(i)))

    options = MDAndClassifierOptions()
    options.input_folder = input_folder
    options.output_file = str(tmp_path / 'two_stage.json')
    options.detector_model = tiny_detector
    options.classifier_model = tiny_classifier
    options.classification_confidence_threshold = 0.01
    options.include_videos = False
    options.verbose = False

    data = run_md_and_classifier(options)

    assert 'classification_categories' in data
    assert data['classification_categories']['0'] == 'deer'
    # At least one animal detection got classified (random weights emit
    # many detections)
    n_classified = sum(
        1 for im in data['images']
        for det in im.get('detections') or []
        if 'classifications' in det)
    assert n_classified > 0
    for im in data['images']:
        for det in im.get('detections') or []:
            for c in det.get('classifications', []):
                assert c[0] in data['classification_categories']
                assert 0 <= c[1] <= 1


def test_two_stage_cli_list_classifier_options(
        tiny_detector, tiny_classifier, tmp_path):
    """The CLI's --classifier_options k=v list form parses into the
    SpeciesClassifier options dict (and unknown keys raise)."""

    from megadetector_tpu.detection.run_md_and_classifier import (
        MDAndClassifierOptions, run_md_and_classifier)

    input_folder = str(tmp_path / 'images')
    os.makedirs(input_folder)
    rng = np.random.RandomState(3)
    Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                dtype=np.uint8)).save(
        os.path.join(input_folder, 'im0.jpg'))

    options = MDAndClassifierOptions()
    options.input_folder = input_folder
    options.output_file = str(tmp_path / 'two_stage.json')
    options.detector_model = tiny_detector
    options.classifier_model = tiny_classifier
    options.classification_confidence_threshold = 0.01
    options.include_videos = False
    options.verbose = False
    # argparse nargs='*' delivers a list of 'k=v' strings
    options.classifier_options = ['folded_stem=off', 'dtype=float32',
                                  'crop_mode=stretch']
    data = run_md_and_classifier(options)
    assert any('classifications' in det for im in data['images']
               for det in im.get('detections') or [])

    options.output_file = str(tmp_path / 'two_stage2.json')
    options.classifier_options = ['no_such_option=1']
    with pytest.raises(ValueError, match='no_such_option'):
        run_md_and_classifier(options)


def _smoothing_scenario():
    """5 cow detections, 1 deer, 1 'other' in one image."""

    detections = []
    for i in range(5):
        detections.append({'category': '1', 'conf': 0.9,
                           'bbox': [0.1 * i, 0.1, 0.05, 0.05],
                           'classifications': [['2', 0.9]]})  # cow
    detections.append({'category': '1', 'conf': 0.9,
                       'bbox': [0.6, 0.1, 0.05, 0.05],
                       'classifications': [['0', 0.8]]})      # deer
    detections.append({'category': '1', 'conf': 0.9,
                       'bbox': [0.7, 0.1, 0.05, 0.05],
                       'classifications': [['3', 0.8]]})      # other
    return {
        'images': [{'file': 'a.jpg', 'detections': detections}],
        'detection_categories': {'1': 'animal'},
        'classification_categories': {'0': 'deer', '1': 'fox',
                                      '2': 'cow', '3': 'other'},
        'info': {'format_version': '1.6'},
    }


def test_image_level_smoothing():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_image_level)

    data = _smoothing_scenario()
    options = ClassificationSmoothingOptions()
    out = smooth_classification_results_image_level(data, None, options)
    dets = out['images'][0]['detections']
    # Everything flipped to cow ('2'): 5 cows >= 4, nondominant deer = 1
    for det in dets:
        assert det['classifications'][0][0] == '2'


def test_image_level_smoothing_respects_limits():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_image_level)

    data = _smoothing_scenario()
    # Add a second deer: nondominant count 2 > max 1 -> no full flip,
    # but 'other' still gets overwritten
    data['images'][0]['detections'].append(
        {'category': '1', 'conf': 0.9, 'bbox': [0.8, 0.1, 0.05, 0.05],
         'classifications': [['0', 0.8]]})
    options = ClassificationSmoothingOptions()
    out = smooth_classification_results_image_level(data, None, options)
    dets = out['images'][0]['detections']
    deer = [d for d in dets if d['classifications'][0][0] == '0']
    assert len(deer) == 2  # deer survived
    others = [d for d in dets if d['classifications'][0][0] == '3']
    assert len(others) == 0  # 'other' overwritten to cow


def test_sequence_level_smoothing():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_sequence_level)

    # Each image alone is ambiguous, the sequence is dominated by cows
    images = []
    for i in range(4):
        images.append({'file': 'im{}.jpg'.format(i), 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.05, 0.05],
             'classifications': [['2', 0.9]]}]})
    images.append({'file': 'im4.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.05, 0.05],
         'classifications': [['0', 0.8]]}]})
    data = {'images': images,
            'detection_categories': {'1': 'animal'},
            'classification_categories': {'0': 'deer', '2': 'cow'},
            'info': {}}
    fn_to_seq = {'im{}.jpg'.format(i): 'seq0' for i in range(5)}
    out = smooth_classification_results_sequence_level(
        data, fn_to_seq, None, ClassificationSmoothingOptions())
    assert out['images'][4]['detections'][0]['classifications'][0][0] == \
        '2'


def test_restrict_to_taxa_list(tmp_path):
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import restrict_to_taxa_list

    data = _smoothing_scenario()
    taxonomy = {'cow': ['mammal'], 'deer': ['mammal']}
    taxonomy_file = str(tmp_path / 'taxonomy.json')
    ct_utils.write_json(taxonomy_file, taxonomy)
    data['classification_categories']['4'] = 'mammal'

    out = restrict_to_taxa_list(['deer', 'mammal'], taxonomy_file, data)
    for im in out['images']:
        for det in im.get('detections') or []:
            for c in det.get('classifications', []):
                name = out['classification_categories'][c[0]]
                assert name in ('deer', 'mammal')


def test_strip_nonanimal_classifications():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import strip_classifications_from_nonanimal_detections

    data = {'images': [{'file': 'a.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['0', 0.9]]},
        {'category': '2', 'conf': 0.9, 'bbox': [0, 0, 0.1, 0.1],
         'classifications': [['0', 0.9]]},
    ]}], 'detection_categories': {'1': 'animal', '2': 'person'},
        'info': {}}
    out = strip_classifications_from_nonanimal_detections(data)
    dets = out['images'][0]['detections']
    assert 'classifications' in dets[0]
    assert 'classifications' not in dets[1]


def test_crop_folder_round_trip(tmp_path):
    from megadetector_tpu.postprocessing.create_crop_folder import (
        CreateCropFolderOptions, create_crop_folder,
        crop_results_to_image_results)

    input_folder = str(tmp_path / 'images')
    os.makedirs(input_folder)
    rng = np.random.RandomState(5)
    Image.fromarray(rng.randint(0, 255, (100, 100, 3),
                                dtype=np.uint8)).save(
        os.path.join(input_folder, 'x.jpg'))

    results = {'images': [{'file': 'x.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.4, 0.4]},
        {'category': '1', 'conf': 0.05, 'bbox': [0.6, 0.6, 0.2, 0.2]},
    ]}], 'detection_categories': {'1': 'animal'},
        'info': {'format_version': '1.6'}}
    results_file = str(tmp_path / 'results.json')
    ct_utils.write_json(results_file, results)

    crop_folder = str(tmp_path / 'crops')
    tagged_file = str(tmp_path / 'tagged.json')
    crops_md_file = str(tmp_path / 'crops_md.json')
    options = CreateCropFolderOptions()
    options.n_threads = 1
    create_crop_folder(results_file, input_folder, crop_folder,
                       tagged_file, crops_md_file, options)

    with open(tagged_file) as f:
        tagged = json.load(f)
    dets = tagged['images'][0]['detections']
    assert 'crop_filename' in dets[0]
    assert 'crop_filename' not in dets[1]  # below threshold
    crop_path = os.path.join(crop_folder, dets[0]['crop_filename'])
    assert os.path.isfile(crop_path)
    with Image.open(crop_path) as crop_im:
        assert crop_im.size == (40, 40)

    # Simulate crop-level classification, then map back
    with open(crops_md_file) as f:
        crops_md = json.load(f)
    crops_md['images'][0]['detections'][0]['classifications'] = \
        [['0', 0.95]]
    crops_md['classification_categories'] = {'0': 'deer'}
    classified_crops_file = str(tmp_path / 'crops_classified.json')
    ct_utils.write_json(classified_crops_file, crops_md)

    final = crop_results_to_image_results(
        tagged_file, classified_crops_file, None)
    assert final['images'][0]['detections'][0]['classifications'] == \
        [['0', 0.95]]
    assert final['classification_categories'] == {'0': 'deer'}


@pytest.fixture(scope='module')
def taxonomy_classifier(tmp_path_factory):
    """Classifier whose class names are WI 7-part taxonomy strings."""

    folder = tmp_path_factory.mktemp('tax_classifier')
    cfg = efficientnet.EfficientNetConfig('efficientnetv2_test',
                                          num_classes=3)
    params = efficientnet.init_params(cfg, seed=5)
    path = str(folder / 'tax_classifier.npz')
    save_checkpoint(params, path, {
        'arch': 'efficientnetv2_test',
        'num_classes': 3,
        'class_names': [
            'uuid1;mammalia;cetartiodactyla;cervidae;odocoileus;'
            'virginianus;white-tailed deer',
            'uuid2;mammalia;carnivora;canidae;vulpes;vulpes;red fox',
            ';;;;;;blank',
        ],
        'image_size': 64,
    })
    return path


def test_two_stage_video_pipeline(tiny_detector, tiny_classifier,
                                  tmp_path):
    """Video detections get crops classified from re-decoded frames
    (reference: run_md_and_speciesnet.py:370-460)."""

    import cv2
    from megadetector_tpu.detection.run_md_and_classifier import (
        MDAndClassifierOptions, run_md_and_classifier)

    input_folder = str(tmp_path / 'media')
    os.makedirs(input_folder)
    rng = np.random.RandomState(2)
    path = os.path.join(input_folder, 'vid.mp4')
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                          8, (64, 48))
    assert out.isOpened()
    for _ in range(12):
        out.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    out.release()

    options = MDAndClassifierOptions()
    options.input_folder = input_folder
    options.output_file = str(tmp_path / 'video_two_stage.json')
    options.detector_model = tiny_detector
    options.classifier_model = tiny_classifier
    options.classification_confidence_threshold = 0.01
    options.frame_sample = 4
    options.verbose = False

    data = run_md_and_classifier(options)

    video_images = [im for im in data['images']
                    if im['file'].endswith('.mp4')]
    assert len(video_images) == 1
    n_classified = sum(
        1 for det in video_images[0].get('detections') or []
        if 'classifications' in det)
    assert n_classified > 0
    for det in video_images[0]['detections']:
        assert 'frame_number' in det


def test_two_stage_taxonomy_output(tiny_detector, taxonomy_classifier,
                                   tmp_path):
    """Taxonomy-string class names produce WI-style categories +
    classification_category_descriptions, and the ensemble rolls up."""

    from megadetector_tpu.detection.run_md_and_classifier import (
        MDAndClassifierOptions, run_md_and_classifier)

    input_folder = str(tmp_path / 'images')
    os.makedirs(input_folder)
    rng = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (60, 80, 3),
                                    dtype=np.uint8)).save(
            os.path.join(input_folder, 'im{}.jpg'.format(i)))

    options = MDAndClassifierOptions()
    options.input_folder = input_folder
    options.output_file = str(tmp_path / 'tax_two_stage.json')
    options.detector_model = tiny_detector
    options.classifier_model = taxonomy_classifier
    options.classification_confidence_threshold = 0.01
    options.include_videos = False
    options.apply_ensemble = True
    options.rollup_confidence_threshold = 0.99  # force rollups

    data = run_md_and_classifier(options)

    assert 'classification_category_descriptions' in data
    descriptions = data['classification_category_descriptions']
    categories = data['classification_categories']
    assert categories['0'] == 'white-tailed deer'
    assert descriptions['0'].startswith('uuid1;mammalia')
    # Every classification references a known category
    for im in data['images']:
        for det in im.get('detections') or []:
            for c in det.get('classifications', []):
                assert c[0] in categories


def test_taxonomy_propagation_smoothing():
    """'carnivore-level' classifications propagate down to the specific
    fox when foxes are present (reference semantics)."""

    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_image_level)

    data = {
        'images': [{
            'file': 'x.jpg',
            'detections': [
                {'category': '1', 'conf': 0.9,
                 'classifications': [['0', 0.8]]},
                {'category': '1', 'conf': 0.9,
                 'classifications': [['1', 0.9]]},
                {'category': '1', 'conf': 0.9,
                 'classifications': [['1', 0.85]]},
            ],
        }],
        'classification_categories': {
            '0': 'carnivore', '1': 'red fox'},
        'classification_category_descriptions': {
            '0': 'u0;mammalia;carnivora;;;;carnivore',
            '1': 'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox'},
    }
    options = ClassificationSmoothingOptions()
    options.min_detections_to_overwrite_secondary = 100  # isolate propagation
    options.min_detections_to_overwrite_other = 100
    out = smooth_classification_results_image_level(data, options=options)
    tops = [det['classifications'][0][0]
            for det in out['images'][0]['detections']]
    assert tops == ['1', '1', '1']


def test_merge_and_combine_categories():
    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (merge_classification_categories,
                combine_redundant_classification_categories)

    target = {'images': [],
              'classification_categories': {'0': 'deer', '1': 'fox'}}
    source = {
        'images': [{'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9,
             'classifications': [['0', 0.8], ['1', 0.1]]}]}],
        'classification_categories': {'0': 'fox', '1': 'cow'},
    }
    merged = merge_classification_categories(target, source)
    # fox remapped to target id 1; cow appended as a new id
    assert merged['classification_categories']['1'] == 'fox'
    det = merged['images'][0]['detections'][0]
    assert det['classifications'][0][0] == '1'
    assert 'cow' in merged['classification_categories'].values()

    dup = {
        'images': [{'file': 'b.jpg', 'detections': [
            {'category': '1', 'conf': 0.9,
             'classifications': [['0', 0.5], ['2', 0.3]]}]}],
        'classification_categories': {'0': 'deer', '1': 'fox',
                                      '2': 'Deer'},
    }
    combined = combine_redundant_classification_categories(dup)
    assert len(combined['classification_categories']) == 2
    det = combined['images'][0]['detections'][0]
    # both deer entries merged, max confidence kept
    assert det['classifications'][0] == ['0', 0.5]


def test_restrict_to_taxa_walk_down(tmp_path):
    """allow_walk_down: an ancestor prediction maps to its unique
    on-list descendant (review-batch-4 finding 9)."""

    from megadetector_tpu.postprocessing.classification_postprocessing \
        import restrict_to_taxa_list

    def _data():
        return {
            'images': [{'file': 'a.jpg', 'detections': [
                {'category': '1', 'conf': 0.9,
                 'bbox': [0.1, 0.1, 0.05, 0.05],
                 'classifications': [['0', 0.8]]}]}],
            'detection_categories': {'1': 'animal'},
            'classification_categories': {'0': 'felidae', '1': 'puma'},
            'info': {},
        }

    taxonomy = {'puma': ['felidae', 'mammal'],
                'lynx': ['felidae', 'mammal']}
    taxonomy_file = str(tmp_path / 'tax.json')
    ct_utils.write_json(taxonomy_file, taxonomy)

    # Without walk-down, the 'felidae' prediction is dropped (not on the
    # list, no on-list ancestor)
    out = restrict_to_taxa_list(['puma'], taxonomy_file, _data())
    assert out['images'][0]['detections'][0]['classifications'] == []

    # With walk-down, 'puma' is the unique allowed felid: remap
    out = restrict_to_taxa_list(['puma'], taxonomy_file, _data(),
                                allow_walk_down=True)
    c = out['images'][0]['detections'][0]['classifications'][0]
    assert out['classification_categories'][c[0]] == 'puma'

    # Two allowed felids: ambiguous, so still dropped even with
    # walk-down
    out = restrict_to_taxa_list(['puma', 'lynx'], taxonomy_file,
                                _data(), allow_walk_down=True)
    assert out['images'][0]['detections'][0]['classifications'] == []


def test_within_family_smoothing():
    """Same-family minority species flip to the dominant species when
    max_detections_nondominant_class_same_family allows it (the
    reference's allow_same_family_smoothing knob); different-family
    minorities and the -1 default never flip."""

    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_image_level)

    def scenario():
        return {
            'images': [{
                'file': 'x.jpg',
                'detections': (
                    # 4x red fox (dominant, canidae)
                    [{'category': '1', 'conf': 0.9,
                      'classifications': [['0', 0.9]]}] * 4 +
                    # 1x coyote (same family canidae, different genus)
                    [{'category': '1', 'conf': 0.9,
                      'classifications': [['1', 0.8]]}] +
                    # 1x bobcat (felidae)
                    [{'category': '1', 'conf': 0.9,
                      'classifications': [['2', 0.8]]}]),
            }],
            'classification_categories': {
                '0': 'red fox', '1': 'coyote', '2': 'bobcat'},
            'classification_category_descriptions': {
                '0': 'u0;mammalia;carnivora;canidae;vulpes;vulpes;red fox',
                '1': 'u1;mammalia;carnivora;canidae;canis;latrans;coyote',
                '2': 'u2;mammalia;carnivora;felidae;lynx;rufus;bobcat'},
        }

    def run(options):
        out = smooth_classification_results_image_level(
            scenario(), options=options)
        return [d['classifications'][0][0]
                for d in out['images'][0]['detections']]

    base = ClassificationSmoothingOptions()
    # Isolate the within-family rule from the generic overwrite rules
    base.min_detections_to_overwrite_secondary = 100
    base.min_detections_to_overwrite_other = 100
    base.propagate_classifications_through_taxonomy = False

    # Default (-1): rule disabled, nothing flips
    assert run(base) == ['0'] * 4 + ['1', '2']

    # allow_same_family_smoothing: the coyote flips to red fox; the
    # bobcat (different family) does not
    base.max_detections_nondominant_class_same_family = 10000
    assert run(base) == ['0'] * 5 + ['2']


def test_within_family_smoothing_never_flips_species_to_genus():
    """A species prediction must not flip UP to a same-genus,
    less-specific dominant (reference: the species->genus guard)."""

    from megadetector_tpu.postprocessing.classification_postprocessing \
        import (ClassificationSmoothingOptions,
                smooth_classification_results_image_level)

    data = {
        'images': [{
            'file': 'x.jpg',
            'detections': (
                # 4x genus-level vulpes (dominant)
                [{'category': '1', 'conf': 0.9,
                  'classifications': [['0', 0.9]]}] * 4 +
                # 1x red fox (species under vulpes)
                [{'category': '1', 'conf': 0.9,
                  'classifications': [['1', 0.8]]}]),
        }],
        'classification_categories': {'0': 'vulpes', '1': 'red fox'},
        'classification_category_descriptions': {
            '0': 'u0;mammalia;carnivora;canidae;vulpes;;vulpes',
            '1': 'u1;mammalia;carnivora;canidae;vulpes;vulpes;red fox'},
    }
    options = ClassificationSmoothingOptions()
    options.min_detections_to_overwrite_secondary = 100
    options.min_detections_to_overwrite_other = 100
    options.propagate_classifications_through_taxonomy = False
    options.max_detections_nondominant_class_same_family = 10000
    out = smooth_classification_results_image_level(data, options=options)
    tops = [d['classifications'][0][0]
            for d in out['images'][0]['detections']]
    assert tops == ['0'] * 4 + ['1']
