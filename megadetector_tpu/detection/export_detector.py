"""
Ahead-of-time detector export: serialize a detector's compiled inference
programs (letterboxed uint8 canvas -> NMS'd boxes/scores/classes, weights
baked in as constants) into a single self-contained artifact, and run
detection from that artifact with no model-construction code and no
weight checkpoint at load time.

This is the detector-side counterpart of the classifier's trace_model
(classification/evaluate_model.py) and the TPU-native analog of engine
formats like TensorRT plans: the artifact is a zip of jax.export
StableHLO programs — one per (batch, canvas_height, canvas_width,
candidate_capacity) shape — plus a manifest carrying the model identity
and the preprocessing geometry. The reference has no equivalent (its
PTDetector re-builds the torch graph from the checkpoint on every load,
pytorch_detector.py); on TPU the AOT form is what a production serving
fleet actually wants: startup is deserialize + XLA-compile-from-HLO (no
Python model code, no torch, no weight conversion), and the numerics are
pinned to the exporter's trace.

Confidence and IoU thresholds remain runtime scalars, so one exported
program serves every detection_threshold.

Export:
    python -m megadetector_tpu.detection.export_detector model.npz out.mdpkg \
        [--batch_sizes 1 8] [--aspects 1:1 4:3 3:4] [--platforms cpu tpu]

Run (everything that calls load_detector accepts the artifact):
    python -m megadetector_tpu.detection.run_detector_batch out.mdpkg \
        image_folder results.json
"""

import argparse
import hashlib
import json
import os
import time
import zipfile

import jax
import jax.numpy as jnp

from megadetector_tpu.models.detector import TPUDetector
from megadetector_tpu.ops import boxes as box_ops

ARTIFACT_EXTENSION = '.mdpkg'
MANIFEST_NAME = 'manifest.json'
FORMAT_VERSION = 1

#: Canvas aspect ratios exported by default: square (the universal
#: fallback), plus 4:3 / 3:4 (typical camera-trap stills) and 16:9 /
#: 9:16 (typical video frames). Each becomes the minimal stride-multiple
#: rectangle the detector's auto canvas mode would choose.
DEFAULT_ASPECTS = ('1:1', '4:3', '3:4', '16:9', '9:16')


def _program_name(batch_size, height, width, topk):
    return 'programs/b{}_h{}_w{}_k{}.stablehlo'.format(
        batch_size, height, width, topk)


def _aspect_to_canvas(aspect, image_size, stride):
    """'W:H' aspect string -> the minimal stride-multiple canvas (h, w)."""

    try:
        w_part, h_part = aspect.split(':')
        w_ratio, h_ratio = float(w_part), float(h_part)
        assert w_ratio > 0 and h_ratio > 0
    except Exception:
        raise ValueError(
            "Bad aspect '{}' (expected W:H, e.g. 4:3)".format(aspect))
    # A large representative source image with this aspect; the minimal
    # canvas depends only on the aspect ratio once the long side exceeds
    # image_size (scale-down letterbox), so any big exemplar works
    scale = 8 * image_size / max(w_ratio, h_ratio)
    shape_hw = (int(round(h_ratio * scale)), int(round(w_ratio * scale)))
    return box_ops.auto_target_shape(shape_hw, image_size, stride=stride)


def export_detector(model_file, output_file, batch_sizes=(1, 8),
                    aspects=DEFAULT_ASPECTS, topk_ladder=None,
                    platforms=None, detector_options=None, verbose=False):
    """
    Export a detector checkpoint (or known model name) as an AOT
    artifact at [output_file].

    Args:
        model_file (str): converted checkpoint / known model name, as
            accepted by load_detector
        output_file (str): artifact path (conventionally .mdpkg)
        batch_sizes (list of int): program batch shapes to export; at
            run time, batches pad up to the smallest exported size that
            fits (larger requests are chunked)
        aspects (list of str): 'W:H' aspect ratios; each exports the
            minimal stride-multiple canvas for that aspect (the square
            canvas is always included as the fallback for unlisted
            aspects)
        topk_ladder (list of int, optional): candidate capacities to
            export (default: the detector's pre_nms_topk only); include
            larger values to preserve capacity auto-escalation for
            crowded scenes
        platforms (list of str, optional): jax.export lowering
            platforms, e.g. ['cpu', 'tpu']; default is the current
            backend
        detector_options (dict, optional): options for the underlying
            TPUDetector (image_size, dtype, fused_decode, ...); the
            exported programs bake these in
        verbose (bool): print per-program progress

    Returns:
        dict: the manifest that was written
    """

    from megadetector_tpu.detection.run_detector import load_detector

    options = dict(detector_options or {})
    assert options.get('preprocess_mode', 'host') == 'host', \
        'Only host-preprocess programs are exportable'
    assert options.get('mesh') is None, \
        'Export single-device programs; shard at load time instead'
    # jax.export serializes StableHLO (pre-compilation), so extra
    # compiler flags would silently NOT be baked into the artifact;
    # reject rather than mislead (the loading side forbids the option
    # too — compilation of the artifact uses the default compiler)
    assert options.get('xla_compiler_options') is None, \
        'xla_compiler_options cannot be baked into AOT artifacts ' \
        '(they serialize pre-compilation StableHLO)'

    detector = load_detector(model_file, detector_options=options,
                             verbose=verbose)
    assert isinstance(detector, TPUDetector), \
        'Only TPU detectors are exportable (got {})'.format(
            type(detector).__name__)

    from jax import export as jax_export

    image_size = detector.default_image_size
    stride = detector.letterbox_stride
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    assert batch_sizes and batch_sizes[0] >= 1

    canvases = {(image_size, image_size)}
    for aspect in (aspects or ()):
        canvases.add(_aspect_to_canvas(aspect, image_size, stride))
    canvases = sorted(canvases)

    if topk_ladder is None:
        topk_ladder = [detector.pre_nms_topk]
    topk_ladder = sorted(set(int(k) for k in topk_ladder))

    manifest = {
        'format_version': FORMAT_VERSION,
        'source_model': os.path.basename(str(model_file)),
        'metadata': detector.metadata or {},
        'class_names': list(detector.class_names),
        'image_size': image_size,
        'letterbox_stride': stride,
        'compatibility_mode': detector.compatibility_mode,
        'compute_dtype': jnp.dtype(detector.compute_dtype).name,
        'max_det': detector.max_det,
        'pre_nms_topk': detector.pre_nms_topk,
        'topk_ladder': topk_ladder,
        'batch_sizes': batch_sizes,
        'canvases': [list(c) for c in canvases],
        'platforms': list(platforms) if platforms else
            [jax.default_backend()],
        'use_model_native_classes': detector.use_model_native_classes,
    }

    n_programs = len(batch_sizes) * len(canvases) * len(topk_ladder)
    start = time.time()
    program_hashes = {}
    with zipfile.ZipFile(output_file, 'w', zipfile.ZIP_DEFLATED) as z:
        i_program = 0
        for batch_size in batch_sizes:
            for (height, width) in canvases:
                for topk in topk_ladder:
                    i_program += 1
                    if verbose:
                        print('Exporting program {}/{}: b{} {}x{} k{}'
                              .format(i_program, n_programs, batch_size,
                                      height, width, topk))
                    fn = detector._get_compiled(batch_size, height,
                                                width, pre_nms_topk=topk)
                    params = detector.params

                    def run(images_u8, conf_thres, iou_thres,
                            _fn=fn, _params=params):
                        return _fn(_params, images_u8, conf_thres,
                                   iou_thres)

                    exported = jax_export.export(
                        jax.jit(run), platforms=platforms)(
                        jax.ShapeDtypeStruct(
                            (batch_size, height, width, 3), jnp.uint8),
                        jax.ShapeDtypeStruct((), jnp.float32),
                        jax.ShapeDtypeStruct((), jnp.float32))
                    name = _program_name(batch_size, height, width,
                                         topk)
                    blob = exported.serialize()
                    program_hashes[name] = hashlib.sha256(
                        bytes(blob)).hexdigest()
                    z.writestr(name, blob)
        # Written last so it can carry per-program integrity hashes,
        # verified at load time (a silently corrupt serialized program
        # must never reach the compiler)
        manifest['program_sha256'] = program_hashes
        z.writestr(MANIFEST_NAME, json.dumps(manifest, indent=1))

    if verbose:
        print('Exported {} programs to {} in {:.1f}s ({:.1f} MB)'.format(
            n_programs, output_file, time.time() - start,
            os.path.getsize(output_file) / 1e6))
    return manifest


class ExportedDetector(TPUDetector):
    """
    Run detection from an exported artifact. Implements the full
    detector protocol (generate_detections_one_image/_batch,
    preprocess_image, checkpoint semantics) by reusing the TPUDetector
    driver around deserialized AOT programs instead of a live model:
    weights are baked into the programs, so no checkpoint, architecture
    code, or weight conversion is involved at load time.

    Constraints inherent to the AOT form:
    - host preprocessing only (the canvas is the program input)
    - canvases are fixed to the exported set; images whose minimal
      rectangle was not exported letterbox onto the square canvas
    - batches chunk/pad to the exported batch sizes
    - candidate-capacity escalation is bounded by the exported
      topk_ladder (beyond it, images carry the standard
      'pre_nms_truncation' flag)
    - TTA (augment=True) is unavailable
    - no mesh sharding: the serialized programs are single-device (the
      batch driver's auto-mesh skips detectors with supports_mesh
      False); scale AOT serving by running one process per chip
    """

    #: The serialized programs are single-device; the batch driver must
    #: not attach a data-parallel mesh to this detector
    supports_mesh = False

    def __init__(self, artifact_path, detector_options=None,
                 verbose=False):

        options = dict(detector_options or {})
        for forbidden in ('mesh', 'image_size', 'arch', 'dtype',
                          'fused_decode', 'folded_early', 'folded_h2',
                          'approx_select', 'select_cm', 'stem_gemm',
                          'bf16_resize', 'conv_backend',
                          'bottleneck_variant', 'pre_nms_topk',
                          'xla_compiler_options'):
            assert options.get(forbidden) is None, \
                '{} is fixed at export time for AOT artifacts'.format(
                    forbidden)
        assert options.get('preprocess_mode', 'host') == 'host', \
            'Exported artifacts contain host-preprocess programs only'

        with zipfile.ZipFile(artifact_path, 'r') as z:
            manifest = json.loads(z.read(MANIFEST_NAME).decode('utf-8'))
            assert manifest.get('format_version') == FORMAT_VERSION, \
                'Unsupported artifact format version {}'.format(
                    manifest.get('format_version'))
            self._program_bytes = {
                name: z.read(name) for name in z.namelist()
                if name.startswith('programs/')}
            # Integrity is two-sided: every program in the archive must
            # carry a manifest hash that matches (format_version 1 always
            # writes them — an unhashed member means tampering), and
            # every hashed name must exist in the archive (a missing
            # program would otherwise surface as a confusing per-batch
            # KeyError at inference time)
            hashes = manifest.get('program_sha256') or {}
            missing = sorted(set(hashes) - set(self._program_bytes))
            if missing:
                raise ValueError(
                    'Corrupt artifact: manifest lists programs absent '
                    'from the archive: {}'.format(missing))
            for name, blob in self._program_bytes.items():
                expected = hashes.get(name)
                if expected is None:
                    raise ValueError(
                        'Corrupt artifact: {} has no integrity hash in '
                        'the manifest'.format(name))
                got = hashlib.sha256(blob).hexdigest()
                if got != expected:
                    raise ValueError(
                        'Corrupt artifact: {} sha256 mismatch '
                        '(manifest {}..., got {}...)'.format(
                            name, expected[:12], got[:12]))

        self._manifest = manifest
        self._programs = {}  # (b, h, w, k) -> deserialized Exported
        self._exported_canvases = set(
            tuple(c) for c in manifest['canvases'])
        self._exported_batch_sizes = sorted(manifest['batch_sizes'])
        self._topk_ladder = sorted(manifest['topk_ladder'])

        options.setdefault('compatibility_mode',
                           manifest['compatibility_mode'])
        options['pre_nms_topk'] = self._topk_ladder[0]
        # User-supplied values beyond the exported shapes would only
        # fail at runtime (escalation/padding requesting a program that
        # was never exported, contained as per-batch inference
        # failures); reject them up front instead
        max_topk = options.setdefault('max_pre_nms_topk',
                                      self._topk_ladder[-1])
        if int(max_topk) > self._topk_ladder[-1]:
            raise ValueError(
                'max_pre_nms_topk {} exceeds the largest exported '
                'candidate capacity {} (re-export with --topk_ladder '
                'covering it)'.format(max_topk, self._topk_ladder[-1]))
        pad_to = options.get('pad_batches_to')
        if pad_to is not None and \
                int(pad_to) > self._exported_batch_sizes[-1]:
            raise ValueError(
                'pad_batches_to {} exceeds the largest exported batch '
                'size {} (re-export with --batch_sizes covering '
                'it)'.format(pad_to, self._exported_batch_sizes[-1]))
        options.setdefault('use_model_native_classes',
                           manifest.get('use_model_native_classes',
                                        False))

        super().__init__(artifact_path, detector_options=options,
                         verbose=verbose)

        # The artifact only carries lowerings for the platforms it was
        # exported with; a mismatched backend (e.g. a tpu-only .mdpkg
        # loaded with force_cpu) would otherwise construct fine and fail
        # confusingly at the first prog.call, contained as per-batch
        # inference failures
        # Experimental PJRT plugins expose the TPU under their own
        # backend name (e.g. 'axon'); lowerings are still 'tpu'
        def _canon(p):
            p = str(p).lower()
            return {'axon': 'tpu', 'gpu': 'cuda'}.get(p, p)

        backend = _canon(jax.default_backend())
        platforms = [_canon(p) for p in manifest['platforms']]
        if backend not in platforms:
            raise ValueError(
                'Artifact {} was exported for platform(s) {} but the '
                'current JAX backend is {}; re-export with '
                '--platforms {} (or include both)'.format(
                    artifact_path, platforms, backend, backend))

    #%% Loading

    def _load_model(self, model_path, options):
        manifest = self._manifest
        self.metadata = dict(manifest.get('metadata') or {})
        self.model_type = self.metadata.get('model_type', 'exported')
        self.class_names = list(manifest['class_names'])
        self.default_image_size = int(manifest['image_size'])
        self.letterbox_stride = int(manifest['letterbox_stride'])
        self.params = None
        self.config = None
        if self.verbose:
            print('Loaded exported artifact {} ({} programs, '
                  'platforms {})'.format(
                      model_path, len(self._program_bytes),
                      manifest['platforms']))

    #%% Program management

    def _check_image_size(self, image_size):
        """A per-call image_size (run_detector_batch --image_size,
        generate_detections_one_image(image_size=...)) would letterbox
        onto a canvas no exported program matches; without this check
        the mismatch only surfaces inside _run_batch, where failure
        containment silently turns the whole batch into inference
        failures. Mirror the augment= early-raise pattern instead."""

        if image_size is not None and \
                int(image_size) != self.default_image_size:
            raise ValueError(
                'image_size {} differs from the exported canvas size '
                '{}; AOT artifacts run at their export-time image size '
                'only (re-export with detector_options image_size={} '
                'if you need it)'.format(
                    image_size, self.default_image_size, image_size))

    def _effective_topk(self, topk):
        """Round an escalation capacity up to the exported ladder entry
        that will actually execute, so the escalation loop never re-runs
        the identical mapped program for a sparse ladder."""

        usable = [k for k in self._topk_ladder if k >= topk]
        return usable[0] if usable else topk

    def _canvas_key(self, batch_size, height, width, topk):
        """Map a requested program shape onto an exported one: the
        exact canvas, the smallest exported batch that fits, and the
        smallest exported capacity that holds [topk]."""

        usable_b = [b for b in self._exported_batch_sizes
                    if b >= batch_size]
        usable_k = [k for k in self._topk_ladder if k >= topk]
        if (height, width) not in self._exported_canvases or \
                not usable_b or not usable_k:
            raise RuntimeError(
                'No exported program for batch {} canvas {}x{} '
                'capacity {}; artifact has batch sizes {}, canvases {}, '
                'capacities {} (re-export with the shapes you need)'
                .format(batch_size, height, width, topk,
                        self._exported_batch_sizes,
                        sorted(self._exported_canvases),
                        self._topk_ladder))
        return (usable_b[0], height, width, usable_k[0])

    def _get_compiled(self, batch_size, height, width, pre_nms_topk=None):
        topk = pre_nms_topk or self.pre_nms_topk
        key = self._canvas_key(batch_size, height, width, topk)
        prog = self._programs.get(key)
        if prog is None:
            from jax import export as jax_export
            name = _program_name(*key)
            prog = jax_export.deserialize(
                bytearray(self._program_bytes[name]))
            self._programs[key] = prog
        exported_b = key[0]

        def fn(params, images_u8, conf_thres, iou_thres):
            # Pad up to the exported batch shape; TPUDetector._run_batch
            # already pads to pad_batches_to, this covers the remainder
            n = images_u8.shape[0]
            if n < exported_b:
                pad = jnp.tile(images_u8[-1:], (exported_b - n, 1, 1, 1))
                images_u8 = jnp.concatenate([images_u8, pad], axis=0)
            out = prog.call(images_u8, jnp.float32(conf_thres),
                            jnp.float32(iou_thres))
            if n < exported_b:
                out = jax.tree_util.tree_map(lambda a: a[:n], out)
            return out

        return fn

    def _get_compiled_augment(self, batch_size, height, width):
        raise ValueError(
            'augment=True is not supported by exported artifacts '
            '(TTA programs are not serialized); run TTA from the '
            'checkpoint instead')

    def _use_auto_canvas(self, shape_hw, image_size, scaleup=True):
        """Only canvases that were exported are usable; everything else
        falls back to the (always-exported) square canvas."""

        if self.canvas_mode != 'auto':
            return False
        t = self._auto_target_shape(shape_hw, image_size, scaleup)
        return t in self._exported_canvases

    #%% Inference

    def preprocess_image(self, img_original, image_id='unknown',
                         image_size=None, verbose=False):
        self._check_image_size(image_size)
        return super().preprocess_image(
            img_original, image_id=image_id, image_size=image_size,
            verbose=verbose)

    def generate_detections_one_batch(self, img_originals, image_ids=None,
                                      detection_threshold=0.00001,
                                      image_size=None, augment=False,
                                      verbose=False):
        # Raise up front instead of letting batch failure containment
        # convert an unsupported-feature request into per-image
        # 'inference failure' records
        if augment:
            self._get_compiled_augment(0, 0, 0)
        self._check_image_size(image_size)
        return super().generate_detections_one_batch(
            img_originals, image_ids=image_ids,
            detection_threshold=detection_threshold,
            image_size=image_size, augment=augment, verbose=verbose)

    def _run_batch(self, infos, results, detection_threshold, augment):
        # Chunk oversized groups to the largest exported batch program
        max_b = self._exported_batch_sizes[-1]
        for i in range(0, len(infos), max_b):
            super()._run_batch(infos[i:i + max_b], results,
                               detection_threshold, augment)


#%% CLI

def main():

    parser = argparse.ArgumentParser(
        description='Export a detector as a self-contained AOT artifact '
                    '(StableHLO programs with weights baked in)')
    parser.add_argument('model_file',
                        help='converted checkpoint or known model name')
    parser.add_argument('output_file',
                        help='artifact path (conventionally {})'.format(
                            ARTIFACT_EXTENSION))
    parser.add_argument('--batch_sizes', type=int, nargs='+',
                        default=[1, 8])
    parser.add_argument('--aspects', nargs='+',
                        default=list(DEFAULT_ASPECTS),
                        help="canvas aspect ratios as W:H (square is "
                             "always included)")
    parser.add_argument('--topk_ladder', type=int, nargs='+',
                        default=None,
                        help='candidate capacities (default: the '
                             "detector's pre_nms_topk)")
    parser.add_argument('--platforms', nargs='+', default=None,
                        help='lowering platforms, e.g. cpu tpu '
                             '(default: current backend)')
    parser.add_argument('--detector_options', nargs='*', default=None,
                        metavar='KEY=VALUE')
    args = parser.parse_args()

    detector_options = None
    if args.detector_options:
        from megadetector_tpu.utils import ct_utils
        detector_options = ct_utils.parse_kvp_list(args.detector_options)

    export_detector(args.model_file, args.output_file,
                    batch_sizes=args.batch_sizes, aspects=args.aspects,
                    topk_ladder=args.topk_ladder,
                    platforms=args.platforms,
                    detector_options=detector_options, verbose=True)


if __name__ == '__main__':
    main()
