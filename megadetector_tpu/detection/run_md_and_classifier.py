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
DEFAULT_CLASSIFIER_BATCH_SIZE = 8

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
        self.verbose = False


def _classify_detections_for_images(data, image_base, classifier, options):
    """
    Attach classifications to detections in [data] (in place): producer
    thread decodes images and extracts qualifying crops; the main thread
    runs classifier batches.
    """

    # Enumerate (image dict, detection idx) pairs to classify
    crop_q = queue.Queue(maxsize=64)
    sentinel = object()

    def producer():
        for im in data['images']:
            detections = im.get('detections')
            if not detections:
                continue
            qualifying = [
                (i, d) for i, d in enumerate(detections)
                if d['category'] in options.classifiable_categories and
                d['conf'] >= options.classification_confidence_threshold]
            if not qualifying:
                continue
            try:
                image_np = np.asarray(vis_utils.load_image(
                    os.path.join(image_base, im['file'])))
            except Exception:
                continue
            for i_det, det in qualifying:
                crop = extract_crop(image_np, det['bbox'],
                                    expansion=options.crop_expansion,
                                    square=options.square_crops)
                if crop.size == 0:
                    continue
                crop = classifier.preprocess_crop(crop)
                crop_q.put((det, crop))
        crop_q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    pending = []
    n_classified = 0

    def flush():
        nonlocal n_classified
        if not pending:
            return
        dets = [p[0] for p in pending]
        crops = [p[1] for p in pending]
        probs = classifier.classify_batch(crops)
        for det, p in zip(dets, probs):
            det['classifications'] = classifier.top_k(
                p, k=options.top_k_classifications)
        n_classified += len(pending)
        pending.clear()

    while True:
        item = crop_q.get()
        if item is sentinel:
            break
        pending.append(item)
        if len(pending) >= options.classifier_batch_size:
            flush()
    flush()
    thread.join()

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
            process_video_module.process_videos(video_options)
            with open(video_options.output_json_file) as f:
                video_data = json.load(f)
            data['images'].extend(video_data['images'])
            os.remove(video_options.output_json_file)

    # --- Classification step
    classifier = SpeciesClassifier(
        options.classifier_model,
        classifier_options=options.classifier_options)

    n_classified = _classify_detections_for_images(
        data, options.input_folder, classifier, options)
    print('Classified {} detections'.format(n_classified))

    data['classification_categories'] = {
        str(i): name for i, name in enumerate(classifier.class_names)}

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

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()
    options = MDAndClassifierOptions()
    ct_utils.args_to_object(args, options)
    run_md_and_classifier(options)


if __name__ == '__main__':
    main()
