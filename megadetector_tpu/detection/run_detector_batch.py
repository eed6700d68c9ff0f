"""
Batch inference driver: folder/list enumeration, async host-side loading
and preprocessing, fixed-shape batched TPU inference, checkpoint/resume,
and the MD-format JSON writer.

API and file contracts mirror the reference driver
(megadetector/detection/run_detector_batch.py): load_and_run_detector_batch
(:1062), write_results_to_file (:1546, format_version 1.6, sorted images and
conf-sorted detections, max_detection_conf stripped by default), JSON
checkpoints {'checkpoint': [...]} with previous-checkpoint backup (:1465),
and per-image failure containment (:937-1023).

Execution model (TPU-first, replacing the reference's three CPU modes):
a thread pool of image loaders feeds a bounded queue of preprocessed
canvases (the reference's producer/consumer queue, :461-635); the main
thread packs fixed-size batches (padding the tail batch) and dispatches
them to one compiled XLA program; JAX's async dispatch overlaps host
preprocessing of batch N+1 with device execution of batch N. Multi-chip
data parallelism shards the batch axis over a jax.sharding.Mesh instead of
one-process-per-GPU.
"""

import argparse
import copy
import json
import os
import queue
import sys
import threading
import time

from datetime import datetime

from tqdm import tqdm

from megadetector_tpu.detection import run_detector
from megadetector_tpu.detection.run_detector import (
    FAILURE_IMAGE_OPEN,
    DEFAULT_OUTPUT_CONFIDENCE_THRESHOLD,
    get_detector_version_from_filename,
    get_detector_metadata_from_version_string,
    load_detector,
    try_download_known_detector,
)
from megadetector_tpu.utils import ct_utils
from megadetector_tpu.utils import path_utils
from megadetector_tpu.visualization import visualization_utils as vis_utils

# MD results format version emitted by write_results_to_file
# (reference: run_detector_batch.py:119)
CURRENT_FORMAT_VERSION = '1.6'

verbose = False


#%% Support functions


def _load_and_preprocess(detector, im_file, image_size=None,
                         include_exif_data=False, skip_preprocess=False):
    """
    Load one image (EXIF-rotated RGB) and letterbox it for the detector.
    Returns a preprocess_image() dict, or a failure-string for load errors.
    """

    try:
        image = vis_utils.load_image(im_file)
    except Exception:
        return FAILURE_IMAGE_OPEN

    exif_data = None
    if include_exif_data:
        try:
            from megadetector_tpu.data_management.read_exif import \
                read_pil_exif
            exif_data = read_pil_exif(image)
        except Exception:
            exif_data = None

    if skip_preprocess:
        info = {'file': im_file, 'img_original': image}
    else:
        try:
            info = detector.preprocess_image(image, image_id=im_file,
                                             image_size=image_size)
        except Exception:
            return FAILURE_IMAGE_OPEN

    if exif_data is not None:
        info['exif_metadata'] = exif_data
    return info


def _exif_for_result(info):
    return info.get('exif_metadata', None) if isinstance(info, dict) else None


#%% Checkpointing
#
# File format is contractual: {'checkpoint': [image dicts]}
# (reference: run_detector_batch.py:1465-1520)


def write_checkpoint(checkpoint_path, results):
    """
    Write [results] to [checkpoint_path], first backing up any previous
    checkpoint to '<path>_tmp' so a mid-write crash can't lose both.
    """

    checkpoint_tmp_path = None
    if os.path.isfile(checkpoint_path):
        checkpoint_tmp_path = checkpoint_path + '_tmp'
        import shutil
        shutil.copyfile(checkpoint_path, checkpoint_tmp_path)

    ct_utils.write_json(checkpoint_path,
                        {'checkpoint': [r for r in results
                                        if r is not None]},
                        force_str=True)

    if checkpoint_tmp_path is not None:
        os.remove(checkpoint_tmp_path)


def load_checkpoint(checkpoint_path):
    """Read a checkpoint file; returns the list of image results."""

    with open(checkpoint_path) as f:
        saved = json.load(f)
    assert 'checkpoint' in saved, \
        'Checkpoint file {} is invalid (no "checkpoint" field)'.format(
            checkpoint_path)
    return saved['checkpoint']


#%% Main API


def load_and_run_detector_batch(model_file,
                                image_file_names,
                                checkpoint_path=None,
                                confidence_threshold=None,
                                checkpoint_frequency=-1,
                                results=None,
                                n_cores=1,
                                use_image_queue=True,
                                quiet=False,
                                image_size=None,
                                batch_size=8,
                                augment=False,
                                include_image_size=False,
                                include_image_timestamp=False,
                                include_exif_data=False,
                                detector_options=None,
                                loader_workers=8,
                                queue_depth=64,
                                loader_pool_type='thread',
                                use_native_loader=False):
    """
    Run a detector over a list of image files; returns a list of MD-format
    image dicts (reference: run_detector_batch.py:1062-1439).

    Args:
        model_file: model name ('MDV5A') or checkpoint path
        image_file_names: list of absolute image paths (or a folder, or a
            .json/.txt list file)
        checkpoint_path: JSON checkpoint destination (enables resume)
        confidence_threshold: output confidence floor (default 0.005)
        checkpoint_frequency: write a checkpoint every N images (-1 = off)
        results: partial results from a loaded checkpoint; already-processed
            files are skipped
        n_cores: accepted for API compatibility; the TPU pipeline always
            uses an async loader pool + device batching
        use_image_queue: accepted for API compatibility (always queued)
        quiet: suppress the per-image progress bar
        image_size: override the model's inference canvas
        batch_size: images per compiled device step
        augment: test-time augmentation (the reference's augment flag,
            run_detector_batch.py:212,236): multi-scale + flip passes
            merged before NMS; requires host preprocessing
        include_image_size/timestamp/exif_data: enrich results with EXIF
        detector_options: dict of TPUDetector options
        loader_workers: host threads decoding/letterboxing images
        queue_depth: bounded preprocessed-image queue size
        loader_pool_type: 'thread' or 'process' loader pool
        use_native_loader: decode+rotate+letterbox JPEGs with the native
            C++/libjpeg kernel (native/jpeg_loader.cpp) in the process
            loader pool — a host-side performance mode whose decode can
            differ from PIL by a couple of levels; parity-critical runs
            keep the default PIL/cv2 path

    Returns:
        list of image-result dicts
    """

    if confidence_threshold is None:
        confidence_threshold = DEFAULT_OUTPUT_CONFIDENCE_THRESHOLD
    if results is None:
        results = []

    # Accept a folder or a list file in place of a list
    if isinstance(image_file_names, str):
        if os.path.isdir(image_file_names):
            image_file_names = path_utils.find_images(image_file_names,
                                                      recursive=True)
        elif image_file_names.endswith('.json') or \
                image_file_names.endswith('.txt'):
            image_file_names = path_utils.read_list_from_file(
                image_file_names)
        else:
            image_file_names = [image_file_names]

    already_processed = set(r['file'] for r in results)
    images_to_process = [fn for fn in image_file_names
                         if fn not in already_processed]

    # Under pytest, randomize PROCESSING order to surface batching bugs
    # while preserving the caller-visible return order (reference
    # anti-flake hardening: run_detector_batch.py:100-106). perm[j] is
    # the original index of the j-th processed image.
    perm = None
    if os.environ.get('PYTEST_CURRENT_TEST') is not None:
        import random as _random
        perm = list(range(len(images_to_process)))
        _random.Random(0).shuffle(perm)
        images_to_process = [images_to_process[i] for i in perm]
    if len(images_to_process) < len(image_file_names) and not quiet:
        print('Bypassing {} already-processed images'.format(
            len(image_file_names) - len(images_to_process)))

    if len(images_to_process) == 0:
        return results

    if hasattr(model_file, 'preprocess_image'):
        detector = model_file
    else:
        # One compiled program serves full and tail batches
        detector_options = dict(detector_options or {})
        detector_options.setdefault('pad_batches_to', batch_size)
        use_mesh = str(detector_options.pop('use_mesh', 'true')).lower() \
            not in ('false', '0', 'no')
        detector = load_detector(model_file,
                                 detector_options=detector_options)

        # Data-parallel batch sharding over all local devices (the
        # TPU-native analog of the reference's one-process-per-GPU
        # sharding, run_detector_batch.py:20-34). Done after
        # load_detector so a force_cpu option has already taken effect.
        if use_mesh and hasattr(detector, 'mesh') and \
                detector.mesh is None and \
                getattr(detector, 'supports_mesh', True):
            import jax
            n_dev = jax.local_device_count()
            if n_dev > 1:
                from megadetector_tpu.parallel.mesh import make_data_mesh
                if batch_size % n_dev != 0:
                    batch_size = ((batch_size + n_dev - 1)
                                  // n_dev) * n_dev
                    if not quiet:
                        print('Rounded batch size up to {} for {} '
                              'devices'.format(batch_size, n_dev))
                detector.pad_batches_to = batch_size
                detector.mesh = make_data_mesh()

    # --- Async loader pool -> bounded queue of (index, info) ---
    #
    # 'thread' mode: loader threads call the detector's preprocess (PIL /
    # cv2 release the GIL for the heavy parts). 'process' mode: a process
    # pool runs the jax-free worker (_loader_worker.py), the analog of
    # the reference's producer processes — use it when decode+letterbox
    # saturates the GIL.

    preprocessed_q = queue.Queue(maxsize=queue_depth)
    n_images = len(images_to_process)

    # EXIF enrichment runs on the Python loader path only; the process
    # workers don't collect it, so those runs use the thread pool
    if loader_pool_type == 'process' and (include_exif_data or
                                          include_image_timestamp):
        print('Note: EXIF enrichment requires the thread loader pool; '
              'switching loader_pool_type to thread')
        loader_pool_type = 'thread'

    threads = []
    if loader_pool_type == 'process':
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor
        from megadetector_tpu.detection._loader_worker import \
            load_and_letterbox

        image_size_resolved = image_size or detector.default_image_size
        worker_args = [
            (fn, image_size_resolved, detector.letterbox_stride,
             detector.compatibility_mode,
             getattr(detector, 'preprocess_mode', 'host'),
             getattr(detector, 'max_staging_side', None),
             use_native_loader,
             getattr(detector, 'canvas_mode', 'square'),
             getattr(detector, 'max_canvases', None))
            for fn in images_to_process]

        def pump():
            # spawn, not fork: JAX is initialized (and multithreaded) in
            # this process by the time the pool starts; forking it can
            # deadlock. The worker module is jax-free, so spawn is safe.
            # Sentinels go out in finally: a broken pool (OOM-killed
            # child, spawn failure) must fail the run, not hang the
            # consumer waiting for sentinels that never come.
            i = -1
            try:
                with ProcessPoolExecutor(
                        max_workers=loader_workers,
                        mp_context=multiprocessing.get_context(
                            'spawn')) as pool:
                    for i, (im_file, info) in enumerate(
                            pool.map(load_and_letterbox, worker_args,
                                     chunksize=4)):
                        preprocessed_q.put((i, im_file, info))
            except Exception as e:
                print('Loader pool failure: {}'.format(e))
                # Mark the images the pool never delivered as failures
                for j in range(i + 1, n_images):
                    preprocessed_q.put((j, images_to_process[j],
                                        FAILURE_IMAGE_OPEN))
            finally:
                for _ in range(loader_workers):
                    preprocessed_q.put(None)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        threads.append(t)
    else:
        # The native C++ loader releases the GIL for the whole
        # decode+rotate+letterbox call, so it scales across loader
        # threads without a process pool. EXIF enrichment needs the
        # Python loader, so those runs fall through to it.
        native_ok = (use_native_loader and not include_exif_data and
                     not include_image_timestamp)
        if native_ok:
            from megadetector_tpu.detection._loader_worker import \
                load_and_letterbox as _native_worker
            native_args = (image_size or detector.default_image_size,
                           detector.letterbox_stride,
                           detector.compatibility_mode,
                           getattr(detector, 'preprocess_mode', 'host'),
                           getattr(detector, 'max_staging_side', None),
                           True,
                           getattr(detector, 'canvas_mode', 'square'),
                           getattr(detector, 'max_canvases', None))

        def loader(worker_idx):
            # The sentinel must reach the queue even if a loader path
            # raises unexpectedly; undelivered images become failures
            delivered = set()
            try:
                for i in range(worker_idx, n_images, loader_workers):
                    im_file = images_to_process[i]
                    if native_ok:
                        _, info = _native_worker((im_file,) + native_args)
                    else:
                        info = _load_and_preprocess(
                            detector, im_file, image_size=image_size,
                            include_exif_data=include_exif_data)
                    preprocessed_q.put((i, im_file, info))
                    delivered.add(i)
            except Exception as e:
                print('Loader worker failure: {}'.format(e))
                for j in range(worker_idx, n_images, loader_workers):
                    if j not in delivered:
                        preprocessed_q.put((j, images_to_process[j],
                                            FAILURE_IMAGE_OPEN))
            finally:
                preprocessed_q.put(None)  # per-worker sentinel

        for w in range(loader_workers):
            t = threading.Thread(target=loader, args=(w,), daemon=True)
            t.start()
            threads.append(t)

    # --- Consumer: pack batches, run device program, emit results ---
    #
    # Batches pack per canvas shape (the reference's shape-grouped
    # batching, pytorch_detector.py:1228-1251): with canvas_mode='auto'
    # each aspect bucket fills its own batch so full batches always run
    # one homogeneous compiled program; 'square' mode degenerates to a
    # single bucket.

    new_results = [None] * n_images
    n_sentinels = 0
    pending = {}  # canvas shape -> list of (index, im_file, info)
    images_since_checkpoint = 0
    pbar = None if quiet else tqdm(total=n_images)

    def flush_bucket(bucket):
        nonlocal images_since_checkpoint
        if len(bucket) == 0:
            return
        batch_infos = [p[2] for p in bucket]
        batch_results = detector.generate_detections_one_batch(
            batch_infos,
            [p[1] for p in bucket],
            detection_threshold=confidence_threshold,
            image_size=image_size, augment=augment)
        for (idx, im_file, info), r in zip(bucket, batch_results):
            _augment_result(r, info,
                            include_image_size=include_image_size,
                            include_image_timestamp=
                            include_image_timestamp,
                            include_exif_data=include_exif_data)
            new_results[idx] = r
        images_since_checkpoint += len(bucket)
        if pbar is not None:
            pbar.update(len(bucket))
        bucket.clear()

    def flush_all_pending():
        # Tail-bucket merge: when batches pad to a mesh multiple (or an
        # explicit pad_batches_to), k leftover rect-canvas buckets would
        # each pad to that multiple — k nearly-empty device programs.
        # Re-letterbox those images onto the always-available square
        # canvas and run them as ONE padded batch instead.
        mesh_multiple = 1
        if getattr(detector, 'mesh', None) is not None:
            mesh_multiple = int(detector.mesh.devices.size)
        elif getattr(detector, 'pad_batches_to', None):
            mesh_multiple = int(detector.pad_batches_to)
        if mesh_multiple > 1:
            small = [b for b in pending.values()
                     if b and len(b) % mesh_multiple != 0]
            total = sum(len(b) for b in small)
            if len(small) > 1 and total <= batch_size:
                merged = []
                for b in small:
                    for idx, im_file, info in b:
                        new_info = detector.repreprocess_on_square_canvas(
                            info, image_size=image_size)
                        if new_info is None:
                            merged = None
                            break
                        merged.append((idx, im_file, new_info))
                    if merged is None:
                        break
                if merged is not None:
                    for b in small:
                        b.clear()
                    pending.setdefault('_merged_square', []).extend(
                        merged)
        for bucket in pending.values():
            flush_bucket(bucket)

    while n_sentinels < loader_workers:
        item = preprocessed_q.get()
        if item is None:
            n_sentinels += 1
            continue
        idx, im_file, info = item

        if isinstance(info, str):
            # Load failure
            new_results[idx] = {
                'file': im_file,
                'detections': None,
                'failure': info,
            }
            if pbar is not None:
                pbar.update(1)
        else:
            shape = tuple(info.get('target_shape') or (0, 0))
            bucket = pending.setdefault(shape, [])
            bucket.append((idx, im_file, info))
            if len(bucket) >= batch_size:
                flush_bucket(bucket)

        if checkpoint_frequency > 0 and checkpoint_path is not None and \
                images_since_checkpoint >= checkpoint_frequency:
            flush_all_pending()
            done = [r for r in new_results if r is not None]
            write_checkpoint(checkpoint_path, results + done)
            if not quiet:
                print('Wrote checkpoint after {} images'.format(len(done)))
            images_since_checkpoint = 0

    flush_all_pending()
    if pbar is not None:
        pbar.close()
    for t in threads:
        t.join()

    assert all(r is not None for r in new_results), \
        'Internal error: unprocessed images remain'

    if perm is not None:
        # Undo the pytest processing shuffle: callers see input order
        restored = [None] * len(new_results)
        for j, orig_idx in enumerate(perm):
            restored[orig_idx] = new_results[j]
        new_results = restored

    results.extend(new_results)

    # Final checkpoint so a crash after inference can't lose results
    if checkpoint_frequency > 0 and checkpoint_path is not None:
        write_checkpoint(checkpoint_path, results)

    return results


def get_image_datetime(image):
    """
    EXIF DateTimeOriginal from a PIL image (or filename) as a
    'YYYY:MM:DD HH:MM:SS' string, or None when absent/malformed
    (reference: run_detector_batch.py:1523-1543).
    """

    import time as _time
    from megadetector_tpu.data_management import read_exif

    try:
        exif_tags = read_exif.read_pil_exif(image)
        datetime_str = exif_tags['DateTimeOriginal']
        _time.strptime(datetime_str, '%Y:%m:%d %H:%M:%S')
        return datetime_str
    except Exception:
        return None


def _augment_result(r, info, include_image_size=False,
                    include_image_timestamp=False, include_exif_data=False):
    """Optionally attach size/timestamp/EXIF fields to an image result."""

    if not isinstance(info, dict):
        return
    if include_image_size and \
            ('original_shape' in info or 'scaling_shape' in info):
        shape = info.get('original_shape', info.get('scaling_shape'))
        r['height'] = int(shape[0])
        r['width'] = int(shape[1])
    exif = info.get('exif_metadata', None)
    if include_exif_data and exif is not None:
        r['exif_metadata'] = exif
    if include_image_timestamp and exif is not None:
        dt = exif.get('DateTimeOriginal', exif.get('DateTime', None))
        if dt is not None:
            r['datetime'] = str(dt)


#%% Output writer


def write_results_to_file(results,
                          output_file,
                          relative_path_base=None,
                          detector_file=None,
                          info=None,
                          include_max_conf=False,
                          custom_metadata=None,
                          force_forward_slashes=True,
                          detection_categories=None):
    """
    Write detection results to a file in the MD output format
    (https://lila.science/megadetector-output-format). Behavior matches the
    reference writer (run_detector_batch.py:1546-1664): relative paths,
    forward slashes, filename-sorted images, conf-sorted detections,
    max_detection_conf stripped unless requested, failures get
    detections=null.

    Returns the dict that was written.
    """

    if relative_path_base is not None:
        results_relative = []
        for r in results:
            r_relative = copy.copy(r)
            r_relative['file'] = os.path.relpath(
                r_relative['file'], start=relative_path_base)
            results_relative.append(r_relative)
        results = results_relative

    if force_forward_slashes:
        results_converted = []
        for r in results:
            r_converted = copy.copy(r)
            r_converted['file'] = r_converted['file'].replace('\\', '/')
            results_converted.append(r_converted)
        results = results_converted

    if info is None:
        info = {
            'detection_completion_time':
                datetime.now().strftime('%Y-%m-%d %H:%M:%S'),
            'format_version': CURRENT_FORMAT_VERSION,
        }
        if detector_file is not None:
            detector_filename = os.path.basename(detector_file)
            detector_version = get_detector_version_from_filename(
                detector_filename)
            detector_metadata = get_detector_metadata_from_version_string(
                detector_version)
            info['detector'] = detector_filename
            info['detector_metadata'] = detector_metadata
        else:
            info['detector'] = 'unknown'
            info['detector_metadata'] = \
                get_detector_metadata_from_version_string('unknown')
    else:
        if detector_file is not None:
            print('Warning (write_results_to_file): info struct and '
                  'detector file supplied, ignoring detector file')

    if custom_metadata is not None:
        info['custom_metadata'] = custom_metadata

    if not include_max_conf:
        for im in results:
            if 'max_detection_conf' in im:
                del im['max_detection_conf']

    results = ct_utils.sort_list_of_dicts_by_key(results, 'file')

    for im in results:
        if 'detections' in im and im['detections'] is not None:
            im['detections'] = ct_utils.sort_list_of_dicts_by_key(
                im['detections'], 'conf', reverse=True)

    for im in results:
        if 'failure' in im:
            if 'detections' in im:
                assert im['detections'] is None, \
                    'Illegal failure/detection combination'
            else:
                im['detections'] = None

    final_output = {
        'images': results,
        'detection_categories':
            detection_categories if detection_categories is not None
            else run_detector.DEFAULT_DETECTOR_LABEL_MAP,
        'info': info,
    }

    try:
        os.makedirs(os.path.dirname(output_file), exist_ok=True)
    except Exception:
        pass

    ct_utils.write_json(output_file, final_output, force_str=True)
    print('Output file saved at {}'.format(output_file))
    return final_output


#%% CLI


def main():

    parser = argparse.ArgumentParser(
        description='Run MegaDetector (TPU) on a folder or list of images, '
                    'writing MD-format JSON')
    parser.add_argument('detector_file',
                        help='model file or known model name (e.g. MDV5A)')
    parser.add_argument('image_file',
                        help='folder of images, a single image, or a '
                             '.json/.txt list of image paths')
    parser.add_argument('output_file',
                        help='output .json path')
    parser.add_argument('--recursive', action='store_true',
                        help='recurse into image_file when it is a folder')
    parser.add_argument('--output_relative_filenames', action='store_true',
                        help='write paths relative to the input folder')
    parser.add_argument('--include_max_conf', action='store_true')
    parser.add_argument('--quiet', action='store_true')
    parser.add_argument('--image_size', type=int, default=None)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--augment', action='store_true',
                        help='test-time augmentation (multi-scale + '
                             'flip passes merged before NMS)')
    parser.add_argument('--threshold', type=float, default=None,
                        help='output confidence floor (default {})'.format(
                            DEFAULT_OUTPUT_CONFIDENCE_THRESHOLD))
    parser.add_argument('--checkpoint_frequency', type=int, default=-1)
    parser.add_argument('--checkpoint_path', default=None)
    parser.add_argument('--resume_from_checkpoint', default=None,
                        help='checkpoint file to resume from, or "auto"')
    parser.add_argument('--allow_checkpoint_overwrite',
                        action='store_true')
    parser.add_argument('--ncores', type=int, default=0,
                        help='(compatibility) loader workers when > 0')
    parser.add_argument('--loader_workers', type=int, default=8)
    parser.add_argument('--loader_pool_type', default='thread',
                        choices=['thread', 'process'])
    parser.add_argument('--use_native_loader', action='store_true',
                        help='decode+letterbox JPEGs with the native '
                             'C++/libjpeg kernel (performance mode; '
                             'decode rounding can differ from PIL by a '
                             'couple of levels)')
    parser.add_argument('--use_image_queue', action='store_true',
                        help='(compatibility) the TPU pipeline always '
                             'uses an async image queue')
    parser.add_argument('--preprocess_on_image_queue',
                        action='store_true',
                        help='(compatibility) preprocessing always runs '
                             'on the loader workers')
    parser.add_argument('--class_mapping_filename', default=None,
                        help='JSON {category_id: name} to use instead of '
                             'the default label map (implies '
                             'use_model_native_classes)')
    parser.add_argument('--include_image_size', action='store_true')
    parser.add_argument('--include_image_timestamp', action='store_true')
    parser.add_argument('--include_exif_data', action='store_true')
    parser.add_argument('--overwrite_handling', default='overwrite',
                        choices=['overwrite', 'skip', 'error'])
    parser.add_argument('--detector_options', nargs='*', default=None)
    parser.add_argument('--previous_results_file', default=None,
                        help='merge results for already-processed images '
                             'from this file')

    if len(sys.argv[1:]) == 0:
        parser.print_help()
        parser.exit()

    args = parser.parse_args()

    if os.path.exists(args.output_file):
        if args.overwrite_handling == 'skip':
            print('Output file {} exists, skipping'.format(
                args.output_file))
            return
        elif args.overwrite_handling == 'error':
            raise ValueError('Output file {} exists'.format(
                args.output_file))

    detector_options = ct_utils.parse_kvp_list(args.detector_options)

    custom_category_map = None
    if args.class_mapping_filename is not None:
        with open(args.class_mapping_filename) as f:
            custom_category_map = json.load(f)
        detector_options['use_model_native_classes'] = 'true'

    # Enumerate images
    if os.path.isdir(args.image_file):
        image_file_names = path_utils.find_images(args.image_file,
                                                  args.recursive)
        source_folder = args.image_file
    elif args.image_file.endswith(('.json', '.txt')):
        image_file_names = path_utils.read_list_from_file(args.image_file)
        source_folder = None
    else:
        image_file_names = [args.image_file]
        source_folder = None

    print('Running detector on {} images'.format(len(image_file_names)))

    # Resume support
    results = []
    checkpoint_path = args.checkpoint_path
    if args.checkpoint_frequency > 0 and checkpoint_path is None:
        output_dir = os.path.dirname(os.path.abspath(args.output_file))
        checkpoint_path = os.path.join(
            output_dir, 'md_checkpoint_{}.json'.format(
                datetime.now().strftime('%Y%m%d%H%M%S')))

    if args.resume_from_checkpoint is not None:
        if args.resume_from_checkpoint == 'auto':
            output_dir = os.path.dirname(os.path.abspath(args.output_file))
            candidates = sorted(
                fn for fn in os.listdir(output_dir)
                if fn.startswith('md_checkpoint') and fn.endswith('.json'))
            assert len(candidates) > 0, \
                'No checkpoint files found for "auto" resume'
            resume_file = os.path.join(output_dir, candidates[-1])
        else:
            resume_file = args.resume_from_checkpoint
        results = load_checkpoint(resume_file)
        print('Restored {} results from checkpoint {}'.format(
            len(results), resume_file))
        if checkpoint_path is None:
            checkpoint_path = resume_file

    # Merge previous results
    if args.previous_results_file is not None:
        with open(args.previous_results_file) as f:
            previous = json.load(f)
        prev_images = previous.get('images', [])
        if source_folder is not None:
            for im in prev_images:
                im['file'] = os.path.join(source_folder, im['file'])
        results.extend(prev_images)
        print('Merged {} previous results'.format(len(prev_images)))

    loader_workers = args.ncores if args.ncores > 0 else args.loader_workers

    start_time = time.time()
    results = load_and_run_detector_batch(
        model_file=args.detector_file,
        image_file_names=image_file_names,
        checkpoint_path=checkpoint_path,
        confidence_threshold=args.threshold,
        checkpoint_frequency=args.checkpoint_frequency,
        results=results,
        quiet=args.quiet,
        image_size=args.image_size,
        batch_size=args.batch_size,
        augment=args.augment,
        include_image_size=args.include_image_size,
        include_image_timestamp=args.include_image_timestamp,
        include_exif_data=args.include_exif_data,
        detector_options=detector_options,
        loader_workers=loader_workers,
        loader_pool_type=args.loader_pool_type,
        use_native_loader=args.use_native_loader)
    elapsed = time.time() - start_time

    n_images = len(image_file_names)
    print('Finished inference for {} images in {:.1f}s '
          '({:.2f} images/sec)'.format(
              n_images, elapsed,
              n_images / elapsed if elapsed > 0 else 0))

    relative_path_base = None
    if args.output_relative_filenames and source_folder is not None:
        relative_path_base = source_folder

    write_results_to_file(
        results, args.output_file,
        relative_path_base=relative_path_base,
        detector_file=args.detector_file if isinstance(
            args.detector_file, str) else None,
        include_max_conf=args.include_max_conf,
        detection_categories=custom_category_map)

    # Delete the checkpoint on success
    if checkpoint_path is not None and os.path.isfile(checkpoint_path):
        os.remove(checkpoint_path)
        print('Deleted checkpoint file {}'.format(checkpoint_path))


if __name__ == '__main__':
    main()
