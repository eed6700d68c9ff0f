"""
Two-stage pipeline: detect -> crop -> species-classify.

Plays the role of the reference's run_md_and_speciesnet driver
(megadetector/detection/run_md_and_speciesnet.py:1357): a detection step
over images and videos, then a classification step that crops detections
above a threshold, classifies them in batches, and attaches
'classifications' arrays plus top-level 'classification_categories' to
the MD output. Default thresholds match the reference (classify
detections >= 0.1, output floor 0.005, classifier batch 8,
:66-69).

TPU-first: the detector and classifier are two compiled XLA programs;
crops are extracted host-side from the already-decoded images and batched
onto the device, with a producer thread keeping the classifier queue full
(the reference's crop producer/consumer queues, :531-640).
"""

import argparse
import json
import os
import queue
import sys
import threading

import numpy as np

from megadetector_tpu.detection import run_detector_batch
from megadetector_tpu.detection import process_video as process_video_module
from megadetector_tpu.detection.run_detector import load_detector
from megadetector_tpu.models.classifier import (SpeciesClassifier,
                                                extract_crop)
from megadetector_tpu.utils import ct_utils
from megadetector_tpu.utils import path_utils
from megadetector_tpu.visualization import visualization_utils as vis_utils

DEFAULT_CLASSIFICATION_THRESHOLD = 0.1
DEFAULT_OUTPUT_THRESHOLD = 0.005
# The reference defaults to 8 for its GPU classifier
# (run_md_and_speciesnet.py:69); the TPU wants larger batches —
# hardware-measured at 480px bf16: b32 = 1078 crops/s, b64 = 1427
# (experiments/exp_classifier_throughput.py). Tail batches pad to this
# size so one compiled program serves every flush.
DEFAULT_CLASSIFIER_BATCH_SIZE = 64

# Only animal detections get classified by default
# (reference: run_md_and_speciesnet.py)
DEFAULT_CLASSIFIABLE_CATEGORIES = ('1',)


class MDAndClassifierOptions:
    """Options controlling run_md_and_classifier()."""

    def __init__(self):
        self.input_folder = None
        self.output_file = None
        self.detector_model = 'MDV5A'
        self.classifier_model = None

        self.detection_confidence_threshold = DEFAULT_OUTPUT_THRESHOLD
        self.classification_confidence_threshold = \
            DEFAULT_CLASSIFICATION_THRESHOLD
        self.classifier_batch_size = DEFAULT_CLASSIFIER_BATCH_SIZE
        self.detector_batch_size = 8
        self.top_k_classifications = 3
        self.classifiable_categories = DEFAULT_CLASSIFIABLE_CATEGORIES
        self.crop_expansion = 0.0
        self.square_crops = False

        self.include_videos = True
        self.frame_sample = None
        self.time_sample = None

        self.image_size = None
        self.detector_options = None
        self.classifier_options = None
        self.loader_workers = 4
        # Crop-producer threads feeding the bounded crop queue
        # (the reference's crop producer pool,
        # run_md_and_speciesnet.py:531-640)
        self.crop_workers = 4
        self.crop_queue_depth = 64
        self.verbose = False

        # Ensemble stage (taxonomy rollup + geofencing, the reference's
        # speciesnet ensemble, run_md_and_speciesnet.py:51-55,1067)
        self.apply_ensemble = False
        self.rollup_confidence_threshold = 0.65
        self.geofence_file = None
        self.taxonomy_file = None
        self.country = None
        self.admin1_region = None


def _qualifying_detections(im, options):
    detections = im.get('detections') or []
    return [
        (i, d) for i, d in enumerate(detections)
        if d['category'] in options.classifiable_categories and
        d['conf'] >= options.classification_confidence_threshold]


def _is_video_result(im):
    return 'frames_processed' in im or 'frame_rate' in im


def _consume_crop_queue(crop_q, n_producers, classifier, options):
    """Drain (det, crop) pairs from [crop_q], classifying in batches.
    Returns the number of classified detections.

    Keeps ONE classifier batch in flight: batch N+1 is dispatched
    (async jax dispatch — host staging + device compute overlap) before
    batch N's results are fetched, so queue draining and crop
    production continue while the device computes. Measured +6-57% on
    host-staged classifier batches (experiments/exp_clf_staging.py);
    results are identical to the serial discipline by construction
    (same batches, same programs, only the fetch point moves)."""

    pending = []
    in_flight = None  # (handle, dets) for the dispatched-not-fetched batch
    n_classified = 0
    n_sentinels = 0

    def drain_in_flight():
        nonlocal in_flight, n_classified
        if in_flight is None:
            return
        handle, dets = in_flight
        in_flight = None
        probs = classifier.fetch_batch(handle)
        for det, p in zip(dets, probs):
            det['classifications'] = classifier.top_k(
                p, k=options.top_k_classifications)
        n_classified += len(dets)

    def flush():
        nonlocal in_flight
        if not pending:
            return
        dets = [p[0] for p in pending]
        crops = [p[1] for p in pending]
        pending.clear()
        # Dispatch the new batch BEFORE blocking on the previous one so
        # the device always has work queued
        handle = classifier.classify_batch_async(
            crops, pad_to=options.classifier_batch_size)
        drain_in_flight()
        in_flight = (handle, dets)

    while n_sentinels < n_producers:
        item = crop_q.get()
        if item is None:
            n_sentinels += 1
            continue
        pending.append(item)
        if len(pending) >= options.classifier_batch_size:
            flush()
    flush()
    drain_in_flight()
    return n_classified


def _classify_detections_for_images(data, image_base, classifier, options):
    """
    Attach classifications to image detections in [data] (in place): a
    pool of producer threads decodes images and extracts qualifying
    crops into a bounded queue (backpressure against the classifier);
    the main thread runs classifier batches.
    """

    work = [im for im in data['images']
            if not _is_video_result(im) and
            _qualifying_detections(im, options)]
    if not work:
        return 0

    n_workers = max(1, min(options.crop_workers, len(work)))
    crop_q = queue.Queue(maxsize=options.crop_queue_depth)

    def producer(worker_idx):
        # The sentinel MUST reach the queue even if a crop transform
        # raises (a dead producer without its sentinel hangs the
        # consumer forever); per-image/per-crop failures are contained
        try:
            for im in work[worker_idx::n_workers]:
                qualifying = _qualifying_detections(im, options)
                try:
                    image_np = np.asarray(vis_utils.load_image(
                        os.path.join(image_base, im['file'])))
                except Exception:
                    continue
                for i_det, det in qualifying:
                    try:
                        crop = extract_crop(
                            image_np, det['bbox'],
                            expansion=options.crop_expansion,
                            square=options.square_crops)
                        if crop.size == 0:
                            continue
                        crop = classifier.preprocess_crop(crop)
                    except Exception as e:
                        if options.verbose:
                            print('Crop failure in {}: {}'.format(
                                im['file'], e))
                        continue
                    crop_q.put((det, crop))
        finally:
            crop_q.put(None)

    threads = []
    for w in range(n_workers):
        t = threading.Thread(target=producer, args=(w,), daemon=True)
        t.start()
        threads.append(t)

    n_classified = _consume_crop_queue(crop_q, n_workers, classifier,
                                       options)
    for t in threads:
        t.join()
    return n_classified


def _classify_detections_for_videos(data, video_base, classifier,
                                    options):
    """
    Attach classifications to VIDEO detections in [data] (in place):
    per video, find the frames carrying qualifying detections, re-decode
    exactly those frames, and push crops into the classifier queue
    (the reference's video-crop path,
    run_md_and_speciesnet.py:370-460).
    """

    from megadetector_tpu.detection import video_utils

    work = []
    for im in data['images']:
        if not _is_video_result(im):
            continue
        if im.get('detections') is None:
            continue
        qualifying = _qualifying_detections(im, options)
        if qualifying:
            work.append((im, qualifying))
    if not work:
        return 0

    n_workers = max(1, min(options.crop_workers, len(work)))
    crop_q = queue.Queue(maxsize=options.crop_queue_depth)

    def process_video(im, qualifying):
        frame_to_dets = {}
        for _, det in qualifying:
            frame_to_dets.setdefault(
                int(det.get('frame_number', 0)), []).append(det)

        def frame_callback(frame_np, frame_id):
            frame_number = video_utils._filename_to_frame_number(
                frame_id)
            for det in frame_to_dets.get(frame_number, []):
                try:
                    crop = extract_crop(
                        frame_np, det['bbox'],
                        expansion=options.crop_expansion,
                        square=options.square_crops)
                    if crop.size == 0:
                        continue
                    crop_q.put((det, classifier.preprocess_crop(crop)))
                except Exception as e:
                    if options.verbose:
                        print('Video crop failure: {}'.format(e))

        video_path = os.path.join(video_base, im['file'])
        try:
            video_utils.run_callback_on_frames(
                video_path, frame_callback,
                frames_to_process=sorted(frame_to_dets),
                allow_empty_videos=True)
        except Exception as e:
            if options.verbose:
                print('Video crop failure for {}: {}'.format(
                    im['file'], e))

    def producer(worker_idx):
        try:
            for im, qualifying in work[worker_idx::n_workers]:
                process_video(im, qualifying)
        finally:
            crop_q.put(None)

    threads = []
    for w in range(n_workers):
        t = threading.Thread(target=producer, args=(w,), daemon=True)
        t.start()
        threads.append(t)

    n_classified = _consume_crop_queue(crop_q, n_workers, classifier,
                                       options)
    for t in threads:
        t.join()
    return n_classified


def run_md_and_classifier(options):
    """
    Run the full two-stage pipeline over options.input_folder, writing MD
    output with classifications to options.output_file. Returns the output
    dict.
    """

    assert options.classifier_model is not None, \
        'A classifier model is required'

    # --- Detection step (images)
    image_files = path_utils.find_images(options.input_folder,
                                         recursive=True)
    detection_results = []
    if len(image_files) > 0:
        detection_results = \
            run_detector_batch.load_and_run_detector_batch(
                options.detector_model, image_files,
                confidence_threshold=
                options.detection_confidence_threshold,
                batch_size=options.detector_batch_size,
                image_size=options.image_size,
                detector_options=ct_utils.parse_kvp_list(
                    options.detector_options)
                if isinstance(options.detector_options, list)
                else options.detector_options,
                loader_workers=options.loader_workers,
                quiet=not options.verbose)

    data = run_detector_batch.write_results_to_file(
        detection_results,
        options.output_file,
        relative_path_base=options.input_folder,
        detector_file=options.detector_model if isinstance(
            options.detector_model, str) else None)

    # --- Detection step (videos)
    if options.include_videos:
        video_files = path_utils.find_videos(options.input_folder,
                                             recursive=True)
        if len(video_files) > 0:
            video_options = process_video_module.ProcessVideoOptions()
            video_options.model_file = options.detector_model
            video_options.input_video_file = options.input_folder
            video_options.output_json_file = \
                options.output_file + '.videos.json'
            video_options.frame_sample = options.frame_sample
            video_options.time_sample = options.time_sample
            video_options.json_confidence_threshold = \
                options.detection_confidence_threshold
            # Videos must detect with the SAME configuration as images
            video_options.detector_options = ct_utils.parse_kvp_list(
                options.detector_options) \
                if isinstance(options.detector_options, list) \
                else options.detector_options
            video_options.image_size = options.image_size
            video_options.verbose = options.verbose
            process_video_module.process_videos(video_options)
            with open(video_options.output_json_file) as f:
                video_data = json.load(f)
            data['images'].extend(video_data['images'])
            os.remove(video_options.output_json_file)

    # --- Classification step
    classifier = SpeciesClassifier(
        options.classifier_model,
        classifier_options=ct_utils.parse_kvp_list(
            options.classifier_options)
        if isinstance(options.classifier_options, list)
        else options.classifier_options)

    n_classified = _classify_detections_for_images(
        data, options.input_folder, classifier, options)
    n_classified += _classify_detections_for_videos(
        data, options.input_folder, classifier, options)
    print('Classified {} detections'.format(n_classified))

    from megadetector_tpu.postprocessing.classification_ensemble import \
        is_taxonomy_string, parse_taxonomy_string

    # WI/SpeciesNet-style taxonomy-string class names: categories get
    # the common name, the full 7-part strings go into
    # classification_category_descriptions (the reference's speciesnet
    # output contract)
    names = classifier.class_names
    if any(is_taxonomy_string(n) for n in names):
        categories = {}
        descriptions = {}
        for i, name in enumerate(names):
            if is_taxonomy_string(name):
                parsed = parse_taxonomy_string(name)
                label = parsed['common_name'] or \
                    next((parsed[l] for l in
                          ('species', 'genus', 'family', 'order',
                           'class') if parsed[l]), name)
                categories[str(i)] = label
                descriptions[str(i)] = name
            else:
                categories[str(i)] = name
                descriptions[str(i)] = name
        data['classification_categories'] = categories
        data['classification_category_descriptions'] = descriptions
    else:
        data['classification_categories'] = {
            str(i): name for i, name in enumerate(names)}

    # Optional ensemble: taxonomy rollup + geofencing
    if options.apply_ensemble:
        from megadetector_tpu.postprocessing.classification_ensemble \
            import (EnsembleOptions, apply_classification_ensemble,
                    load_geofence_table)
        e_options = EnsembleOptions()
        e_options.rollup_confidence_threshold = \
            options.rollup_confidence_threshold
        e_options.top_k = options.top_k_classifications
        if options.geofence_file is not None:
            e_options.geofence_table = load_geofence_table(
                options.geofence_file)
        if options.country is not None:
            location = options.country + (
                '/' + options.admin1_region
                if options.admin1_region else '')
            e_options.location_for_image = lambda im: location
        taxonomy = None
        if options.taxonomy_file is not None:
            from megadetector_tpu.taxonomy_mapping.taxonomy_graph \
                import TaxonomyGraph
            taxonomy = TaxonomyGraph.from_file(options.taxonomy_file)
        data = apply_classification_ensemble(data, taxonomy=taxonomy,
                                             options=e_options)

    ct_utils.write_json(options.output_file, data, force_str=True)
    print('Wrote two-stage results to {}'.format(options.output_file))
    return data


def main():
    parser = argparse.ArgumentParser(
        description='Run the two-stage detect -> classify pipeline')
    parser.add_argument('input_folder')
    parser.add_argument('output_file')
    parser.add_argument('--detector_model', default='MDV5A')
    parser.add_argument('--classifier_model', required=True)
    parser.add_argument('--detection_confidence_threshold', type=float,
                        default=DEFAULT_OUTPUT_THRESHOLD)
    parser.add_argument('--classification_confidence_threshold',
                        type=float,
                        default=DEFAULT_CLASSIFICATION_THRESHOLD)
    parser.add_argument('--classifier_batch_size', type=int,
                        default=DEFAULT_CLASSIFIER_BATCH_SIZE)
    parser.add_argument('--frame_sample', type=int, default=None)
    parser.add_argument('--time_sample', type=float, default=None)
    parser.add_argument('--detector_options', nargs='*', default=None)
    parser.add_argument('--classifier_options', nargs='*', default=None,
                        help='k=v pairs for SpeciesClassifier (e.g. '
                             'quantize=int8 folded_stem=w2 '
                             'dtype=bfloat16)')
    parser.add_argument('--crop_workers', type=int, default=4)
    parser.add_argument('--apply_ensemble', action='store_true',
                        help='apply taxonomy rollup (+ geofencing when '
                             'a geofence file is given)')
    parser.add_argument('--rollup_confidence_threshold', type=float,
                        default=0.65)
    parser.add_argument('--geofence_file', default=None,
                        help='geofence table (SpeciesNet base format '
                             'or {name: [location prefixes]})')
    parser.add_argument('--taxonomy_file', default=None,
                        help='taxonomy rows (.json or .csv: id, level, '
                             'name, parent_id)')
    parser.add_argument('--country', default=None,
                        help='ISO country code for geofencing')
    parser.add_argument('--admin1_region', default=None,
                        help='admin1 region (e.g. US state) for '
                             'geofencing')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    options = MDAndClassifierOptions()
    ct_utils.args_to_object(args, options)
    run_md_and_classifier(options)


if __name__ == '__main__':
    main()
