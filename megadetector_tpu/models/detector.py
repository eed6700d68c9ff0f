"""
The TPU detector: preprocessing, batched forward + on-device NMS, and
MD-format detection emission.

API mirrors the reference's duck-typed detector protocol
(megadetector/detection/pytorch_detector.py:739-1482:
preprocess_image / generate_detections_one_image /
generate_detections_one_batch), with a TPU-first execution model:

- Canvas policy ('canvas_mode' option): 'auto' (default) letterboxes each
  image onto its minimal stride-multiple rectangle and groups same-shape
  images into batches — exactly the reference's behavior
  (pytorch_detector.py:1064-1068 letterbox(auto=True), shape-grouped
  batching :1228-1251) — skipping the ~25-33% of conv FLOPs a square
  canvas burns on gray padding for typical 4:3 camera-trap images.
  'square' letterboxes everything onto one fixed image_size x image_size
  canvas so a single XLA program serves all aspect ratios; letterbox
  ratio/pad are tracked per image and undone by scale_coords, so box
  coordinates are unaffected either way and both modes stay within the
  golden-file tolerances (conf 0.005 / coord 0.001). A max_canvases
  guard bounds compilation count in 'auto' mode.
- uint8 HWC batches are shipped to device; normalization (1/255), the
  network, anchor decode, and class-aware NMS all run inside one jitted
  program per (batch_size, canvas, dtype) triple.
- Optional data-parallel sharding over a jax.sharding.Mesh: the batch axis
  shards across chips, params are replicated (the TPU-native equivalent of
  the reference's one-process-per-GPU scheme, run_detector_batch.py:20-34).
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import load_checkpoint
from megadetector_tpu.ops import boxes as box_ops
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import batched_nms, nms_on_candidates
from megadetector_tpu.utils import ct_utils

# String constants for consistent failure reporting; part of the MD output
# contract (reference: detection/run_detector.py:54-56)
FAILURE_INFER = 'inference failure'
FAILURE_IMAGE_OPEN = 'image access failure'

# Failure containment exists for DATA errors (corrupt images, device
# faults on a batch); bug-shaped exceptions coming out of our own
# program-build/dispatch code must not be silently converted to
# per-batch 'inference failure' records — that masked a real
# AttributeError for most of round 4. Under pytest, or when
# MD_STRICT_FAILURES is set, these exception classes re-raise out of
# the containment blocks instead. (UnboundLocalError subclasses
# NameError; listed for the reader.)
PROGRAMMING_ERRORS = (AttributeError, NameError, UnboundLocalError,
                      ImportError)


def reraise_programming_errors():
    """True when containment should let bug-shaped exceptions surface:
    under pytest, or when MD_STRICT_FAILURES is set non-false."""

    if os.environ.get('PYTEST_CURRENT_TEST'):
        return True
    return os.environ.get('MD_STRICT_FAILURES', '').lower() \
        not in ('', '0', 'false')

# Decimal places for confidences and coordinates
# (reference: detection/run_detector.py:58-60)
CONF_DIGITS = 3
COORD_DIGITS = 4

DEFAULT_DETECTOR_LABEL_MAP = {
    '1': 'animal',
    '2': 'person',
    '3': 'vehicle',
}

DEFAULT_COMPATIBILITY_MODE = 'classic'

# Process-level compiled-program cache: detectors with identical
# architecture/dtype/NMS settings share jitted programs (params are
# arguments, not captures), so constructing several detector instances —
# or many small test detectors — doesn't recompile per instance.
# Mesh-sharded programs are not shared (meshes have identity).
_PROGRAM_CACHE = {}


def _config_cache_key(config):
    import hashlib
    anchors = getattr(config, 'anchors', None)
    anchors_digest = hashlib.md5(
        np.asarray(anchors, np.float32).tobytes()).hexdigest() \
        if anchors is not None else 'none'
    return (config.arch, config.num_classes, anchors_digest)

# Test hook: when True, constructing a detector with the default
# compatibility mode raises — used by test drivers to verify that option
# plumbing reaches the detector (reference:
# detection/pytorch_detector.py:733-737, the 'classic-test' sentinel)
require_non_default_compatibility_mode = False


class TPUDetector:
    """
    YOLOv5-family detector running on JAX/XLA (TPU, or any JAX backend).

    Loads converted checkpoints (.npz + metadata, see
    models/convert_weights.py). Construction options (a dict, mirroring the
    reference's --detector_options):

        compatibility_mode: 'classic' (default) or 'modern' preprocessing
        dtype: 'float32' (default) or 'bfloat16' compute
        preprocess_only: build without weights (queue-worker mode)
        image_size: override the checkpoint's inference canvas
        use_model_native_classes: emit 0-based model classes instead of
            MD categories
        canvas_mode: 'auto' (default; minimal stride-rectangle canvases,
            shape-grouped batches, the reference's behavior) or 'square'
            (one full-canvas program for all aspect ratios)
        max_canvases: compile-guard for 'auto' mode (default 16)
        pre_nms_topk: candidate capacity of the fixed-shape selection
            (default 512, covers normal scenes)
        auto_escalate_topk: re-run batches whose above-floor candidate
            count exceeds the capacity through a bigger program
            (default true; matches the reference's uncapped nms())
        max_pre_nms_topk: escalation ceiling (default 8192); beyond it
            affected images get a 'pre_nms_truncation' field
        max_batch_size: cap on compiled batch size
        mesh: optional jax.sharding.Mesh for data-parallel inference
        batch_axis: mesh axis name for the batch dimension (default 'data')
        xla_compiler_options: extra XLA compiler flags for every program
            this detector builds, as 'name=value[;name=value...]' (or a
            dict). Hardware-swept at the bench config
            (experiments/exp_xla_flags.py): every public TPU tuning flag
            is e2e-neutral-to-worse there, including the best one
            (xla_tpu_scoped_vmem_limit_kib=32768, +0.68%, below the 1%
            landing bar — exp_xla_vmem_confirm), so the default compiler
            stands; the knob exists for other model/canvas mixes and
            future toolchains. Fusion-budget flags can change f32
            reduction splits, so strict compatibility modes ignore it.
    """

    def __init__(self, model_path, detector_options=None, verbose=False):

        options = dict(detector_options or {})
        self._options = options
        self.verbose = verbose

        if _to_bool(options.get('force_cpu', False)):
            jax.config.update('jax_platforms', 'cpu')

        # Persistent XLA compilation cache: later processes skip the
        # 20-40s per-program compiles (opt out: MD_COMPILATION_CACHE=0)
        from megadetector_tpu.utils.compile_cache import \
            enable_persistent_cache
        enable_persistent_cache()

        if require_non_default_compatibility_mode:
            assert options.get('compatibility_mode') not in \
                (None, '', DEFAULT_COMPATIBILITY_MODE), \
                'A non-default compatibility mode is required'
        self.compatibility_mode = options.get('compatibility_mode',
                                              'classic') or 'classic'
        self._compiler_options = None
        if 'strict' not in self.compatibility_mode:
            self._compiler_options = _parse_compiler_options(
                options.get('xla_compiler_options', None))
        if self._compiler_options:
            # Fail fast on invalid flag names/values: a bad flag would
            # otherwise fail every batch compile and surface only as
            # opaque per-image 'inference failure' records through the
            # containment path. One trivial compile validates the set
            # against the actual backend.
            try:
                self._jit(lambda x: x + 1)(
                    jnp.zeros((), jnp.float32)).block_until_ready()
            except Exception as e:
                raise ValueError(
                    'xla_compiler_options rejected by the {} compiler: '
                    '{} ({})'.format(jax.devices()[0].platform,
                                     self._compiler_options, e)) from e
        self.use_model_native_classes = _to_bool(
            options.get('use_model_native_classes', False))
        self.preprocess_only = _to_bool(options.get('preprocess_only',
                                                    False))
        dtype_name = options.get('dtype', 'float32')
        self.compute_dtype = {'float32': jnp.float32,
                              'bfloat16': jnp.bfloat16,
                              'bf16': jnp.bfloat16}[dtype_name]
        self.mesh = options.get('mesh', None)
        self.batch_axis = options.get('batch_axis', 'data')
        # 512 holds every candidate that passes the 0.005 objectness
        # floor on real models (hardware-measured, NEXT.md); _run_batch
        # warns when a lower detection_threshold could overflow it
        self.pre_nms_topk = int(options.get('pre_nms_topk', 512))
        self.max_det = int(options.get('max_det', 300))
        self._warned_low_threshold_topk = False
        # When the above-floor candidate count exceeds pre_nms_topk,
        # the batch re-runs through a program with the next
        # power-of-two candidate capacity (up to max_pre_nms_topk), so
        # the 0.005-floor contract holds like the reference's uncapped
        # nms() — the fixed default stays fast for the normal case and
        # crowded scenes pay one extra compile per (shape, capacity).
        self.auto_escalate_topk = _to_bool(
            options.get('auto_escalate_topk', True))
        self.max_pre_nms_topk = int(options.get('max_pre_nms_topk',
                                                8192))
        # Images whose above-floor candidate count exceeded the largest
        # capacity run (only possible beyond max_pre_nms_topk, or with
        # auto_escalate_topk off); each such image result carries a
        # 'pre_nms_truncation' field with the true count
        self.n_truncated_images = 0
        # Device-slot accounting: real images vs total batch slots
        # (incl. padding to pad_batches_to / the mesh multiple) per
        # program execution — the tail-bucket efficiency metric
        self.images_run = 0
        self.slots_run = 0
        self.programs_run = 0
        self._fused_decode = False  # set per-architecture in _load_model
        self._approx_select = True  # refined per-architecture below
        self._select_cm = False
        self._conv_backend = 'xla'  # may be overridden in _load_model
        self._bottleneck_variant = 'taps'  # idem (pallas backend only)

        # Pad partial batches up to this size so one compiled program
        # serves every step (tail batches otherwise each trigger a new
        # compile); None = compile per batch size
        pad = options.get('pad_batches_to', None)
        self.pad_batches_to = int(pad) if pad else None

        # 'host': cv2 letterbox on the loader threads (parity mode);
        # 'device': images ship as raw uint8 staging canvases and the
        # letterbox resize/pad/normalize runs fused inside the XLA program
        self.preprocess_mode = options.get('preprocess_mode', 'host')
        assert self.preprocess_mode in ('host', 'device')
        # Staging canvases are bucketed to this multiple in device mode
        self.staging_multiple = int(options.get('staging_multiple', 256))

        # Canvas policy. 'auto' (default): letterbox each image onto its
        # minimal stride-multiple rectangle, exactly like the reference
        # (pytorch_detector.py:1064-1068 letterbox(auto=True)); batches
        # are grouped by canvas shape (:1228-1251). On typical 4:3
        # camera-trap images this skips ~25% of the conv FLOPs a square
        # canvas burns on gray padding. 'square': one full
        # image_size x image_size canvas for every aspect ratio (one
        # compiled program total).
        self.canvas_mode = options.get('canvas_mode', 'auto')
        assert self.canvas_mode in ('auto', 'square')
        # Compile-guard: at most this many distinct auto canvases per
        # detector; further new shapes fall back to the square canvas
        # (worst case ~40 shapes exist at stride 64; real folders use
        # 1-3). The square program may thus compile in addition.
        self.max_canvases = int(options.get('max_canvases', 16))
        self._auto_canvases = set()

        self.model_path = model_path
        self.printed_image_size_warning = False

        # Load checkpoint + metadata
        self.params = None
        self.config = None
        self.metadata = None
        self.default_image_size = 1280
        self.letterbox_stride = 64
        self.class_names = ['animal', 'person', 'vehicle']

        if not self.preprocess_only:
            self._load_model(model_path, options)
        else:
            image_size = options.get('image_size', None)
            if image_size is not None:
                self.default_image_size = int(image_size)

        # Compiled program cache: (batch, h, w) -> callable
        self._compiled = {}

        # AddaxAI and other tools parse a device line from the reference;
        # emit an analogous one
        devices = jax.devices()
        print('TPUDetector using device {} ({} available)'.format(
            devices[0].platform, len(devices)))

    #%% Loading

    def _load_model(self, model_path, options):
        start = time.time()

        if model_path.endswith('.pt'):
            raise ValueError(
                'Torch checkpoints must be converted offline first: '
                'python -m megadetector_tpu.models.convert_weights '
                '{} out.npz'.format(model_path))

        params, metadata = load_checkpoint(model_path)
        if metadata is None:
            metadata = {}
        self.metadata = metadata

        arch = options.get('arch', metadata.get('arch', 'yolov5l6'))
        num_classes = int(metadata.get('num_classes', 3))
        anchors = metadata.get('anchors', None)
        self.model_type = metadata.get('model_type', 'yolov5')
        self._fused_decode = False
        if arch.startswith('rfdetr') or (
                self.model_type == 'rfdetr' and
                not arch.startswith('detr')):
            from megadetector_tpu.models import rfdetr
            self.config = rfdetr.RFDetrConfig(
                arch if arch.startswith('rfdetr') else 'rfdetr_base',
                num_classes=num_classes,
                image_size=int(metadata.get('image_size', 560)))
            self._apply_fn = rfdetr.apply
        elif arch.startswith('detr') or self.model_type == 'detr':
            from megadetector_tpu.models import detr
            self.config = detr.DetrConfig(
                arch if arch.startswith('detr') else 'detr_base',
                num_classes=num_classes)
            self._apply_fn = detr.apply
        elif arch.startswith('yolov8') or self.model_type == 'ultralytics':
            from megadetector_tpu.models import yolov8
            self.config = yolov8.YoloV8Config(arch,
                                              num_classes=num_classes)
            self._apply_fn = yolov8.apply
        else:
            self.config = yolov5.YoloV5Config(
                arch, num_classes=num_classes, anchors=anchors)
            self._apply_fn = yolov5.apply
            # Both transforms below are mathematically exact weight/
            # graph rewrites, but they change float reduction order, so
            # outputs can drift by a truncation digit relative to a
            # plain execution. That stays well inside the golden
            # tolerances (conf 0.005 / coord 0.001), which is what the
            # reference itself promises across hardware; for bit-level
            # reproduction of the unoptimized graph, the
            # 'classic-strict' compatibility mode turns them off.
            strict = 'strict' in self.compatibility_mode
            # Fused decode: select NMS candidates straight from the raw
            # detect-head logits instead of materializing the full
            # [B, A, 5+C] f32 decode (~200 MB/step at b64 @1280); see
            # ops/decode.py. Anchor-based yolov5 heads only.
            self._fused_decode = _to_bool(
                options.get('fused_decode', not strict))
            # Verified approx candidate selection: per-level
            # approx_max_k with an exact-count runtime proof and a
            # lax.cond fallback to exact top_k — results are identical
            # by construction (ops/decode._verified_approx_topk), at
            # about half the selection cost. Off in strict mode only so
            # the unoptimized graph stays literally reproducible.
            self._approx_select = _to_bool(
                options.get('approx_select', not strict))
            # Channel-major candidate selection (ops/decode.
            # _select_level_cm): same candidate set/scores in the
            # transposed [B, na, 5+nc, H*W] layout. Hardware-measured
            # NEUTRAL (exp_select_cm_profile: the full-map score work
            # is free in either layout; the selection segment is
            # top_k+gather-bound), so default off; kept as a measured
            # design point.
            self._select_cm = _to_bool(
                options.get('select_cm', False)) and not strict
            # Width-fold the early high-resolution layers (exact weight
            # rewrite, hardware-measured ~1.2x forward win; see
            # ops/folding.py). Opt out with folded_early=false.
            if _to_bool(options.get('folded_early', not strict)):
                from megadetector_tpu.ops import folding
                # folded_h2=true additionally height-folds l0
                # (ops/folding.fold_l0_h2, [3,3,24,*] at 9 taps); on
                # the device-preprocess path the letterbox then emits
                # the folded layout itself (fold_layout='h2').
                # Hardware-measured e2e-NEUTRAL at best (r5
                # exp_h2_emit_e2e: 424.5 vs 422.0 img/s b128 int8 with
                # the emission; r4 exp_h2_cm_e2e: 1.4% slower with the
                # in-model relayout) even though the conv alone wins
                # 17% on a free input (exp_stem_s2d) — default off;
                # kept as a measured design point for future
                # toolchains.
                h2 = (_to_bool(options.get('folded_h2', False)) and
                      not _to_bool(options.get('stem_gemm', False)))
                params = folding.fold_early_params(params, self.config,
                                                   h2=h2)
            # Chained-int8 conv backend: 'xla' (default) or 'pallas'
            # (TPU-only custom kernel for the 3x3 stride-1 chain convs;
            # see ops/pallas_conv.py). Trace-time and process-global —
            # re-asserted before every program build below.
            self._conv_backend = str(
                options.get('conv_backend', 'xla')).lower()
            from megadetector_tpu.ops import quantization as _q
            _q.set_conv_backend(self._conv_backend)
            # cv2 contraction schedule inside the fused bottleneck
            # kernel (only meaningful with conv_backend=pallas):
            # 'taps' (default) | 'im2col' | 'im2col3' — bit-identical
            # outputs, different MXU schedules; every K-contracted
            # form measured slower on the current toolchain
            # (exp_bottleneck_os, docs/perf-profile.md).
            from megadetector_tpu.ops import pallas_bottleneck as _pb
            self._bottleneck_variant = str(
                options.get('bottleneck_variant', 'taps')).lower()
            _pb.set_variant(self._bottleneck_variant)
            # Stem im2col-GEMM: run thin-input convs (C_in <= 16, i.e.
            # the folded/raw stem) as patches + one deep-contraction
            # dot — the profiled l0 block wastes ~91% of MXU lanes
            # through the conv emitter (ops/im2col.py). Exact MAC set;
            # f32 reduction order changes (strict mode keeps it off).
            # Default off pending the hardware A/B
            # (experiments/exp_l0_im2col.py).
            self._stem_gemm = _to_bool(
                options.get('stem_gemm', False)) and not strict
            from megadetector_tpu.ops import im2col as _im2col
            _im2col.set_stem_gemm(self._stem_gemm)
        self.letterbox_stride = int(self.config.max_stride)

        image_size = options.get('image_size',
                                 metadata.get('image_size', 1280))
        self.default_image_size = int(image_size)
        self.class_names = metadata.get(
            'class_names', ['animal', 'person', 'vehicle'][:num_classes])

        # Cast float weights once to the compute dtype and place on
        # device (int8 leaves from quantized checkpoints stay int8)
        target = jnp.bfloat16 if self.compute_dtype == jnp.bfloat16 \
            else jnp.float32

        def _cast(a):
            a = jnp.asarray(a)
            if jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 4:
                return a.astype(target)
            return a

        params = jax.tree_util.tree_map(_cast, params)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(self.mesh, P())
            params = jax.device_put(params, replicated)
        else:
            params = jax.device_put(params)
        self.params = params

        if self.verbose:
            print('Loaded model in {:.2f}s'.format(time.time() - start))

    #%% Compiled program management

    def _assert_trace_globals(self):
        """
        Re-assert this instance's process-global trace-time settings
        (currently the chained-conv backend) before building a program,
        so two detectors with different options in one process each
        trace with their own choice.
        """

        from megadetector_tpu.ops import quantization as _q
        _q.set_conv_backend(getattr(self, '_conv_backend', 'xla'))
        from megadetector_tpu.ops import im2col as _im2col
        _im2col.set_stem_gemm(getattr(self, '_stem_gemm', False))
        from megadetector_tpu.ops import pallas_bottleneck as _pb
        _pb.set_variant(getattr(self, '_bottleneck_variant', 'taps'))

    def _compiler_key(self):
        """Canonical hashable form of the extra compiler options (for
        the process-global program cache; two detectors differing only
        in flags must not share a compiled program)."""

        opts = getattr(self, '_compiler_options', None)
        return tuple(sorted(opts.items())) if opts else None

    def _jit(self, program, **kwargs):
        """jax.jit with this detector's extra XLA compiler options
        applied (the xla_compiler_options option; None = default
        compiler, identical to a plain jax.jit)."""

        opts = getattr(self, '_compiler_options', None)
        if opts:
            kwargs['compiler_options'] = dict(opts)
        return jax.jit(program, **kwargs)

    def _effective_topk(self, topk):
        """The candidate capacity that would actually execute for a
        requested [topk]. Identity for live models (any capacity
        compiles); AOT artifacts round up to their exported ladder."""

        return topk

    def _get_compiled(self, batch_size, height, width,
                      pre_nms_topk=None):
        pre_nms_topk = pre_nms_topk or self.pre_nms_topk
        key = (batch_size, height, width, pre_nms_topk)
        if key in self._compiled:
            return self._compiled[key]
        self._assert_trace_globals()

        config = self.config
        dtype = self.compute_dtype
        max_det = self.max_det
        apply_fn = self._apply_fn

        # Share programs across detector instances with equal settings
        global_key = None
        if self.mesh is None:
            global_key = ('std', _config_cache_key(config),
                          str(dtype), pre_nms_topk, max_det,
                          self._fused_decode, self._approx_select,
                          self._select_cm,
                          getattr(self, '_stem_gemm', False),
                          getattr(self, '_conv_backend', 'xla'),
                          getattr(self, '_bottleneck_variant', 'taps'),
                          self._compiler_key(),
                          batch_size, height, width)
            if global_key in _PROGRAM_CACHE:
                fn = _PROGRAM_CACHE[global_key]
                self._compiled[key] = fn
                return fn

        fused = self._fused_decode
        approx_sel = self._approx_select
        select_cm = self._select_cm

        def program(params, images_u8, conf_thres, iou_thres):
            x = images_u8.astype(dtype) / dtype(255.0)
            if fused:
                heads = apply_fn(config, params, x, dtype=dtype,
                                 decode=False)
                cands = select_topk_candidates(
                    heads, config.anchors, config.strides,
                    config.num_classes, conf_thres, pre_nms_topk,
                    approx=approx_sel, channel_major=select_cm)
                return nms_on_candidates(
                    cands, iou_thres, max_det=max_det,
                    class_agnostic=(config.num_classes == 1))
            pred = apply_fn(config, params, x, dtype=dtype)
            return batched_nms(pred, conf_thres, iou_thres,
                               max_det=max_det, pre_nms_topk=pre_nms_topk)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P(self.batch_axis))
            replicated = NamedSharding(self.mesh, P())
            fn = self._jit(
                program,
                in_shardings=(replicated, data, None, None),
                out_shardings=NamedSharding(self.mesh,
                                            P(self.batch_axis)))
        else:
            fn = self._jit(program)
            _PROGRAM_CACHE[global_key] = fn

        self._compiled[key] = fn
        return fn

    def _get_compiled_augment(self, batch_size, height, width):
        """
        Test-time-augmentation program reproducing the reference's
        augment=True recipe exactly (ultralytics-yolov5
        Model.forward_augment, invoked at pytorch_detector.py:1313):
        passes (scale, hflip) = (1, no), (0.83, yes), (0.67, no); each
        pass flips the ORIGINAL canvas first, bilinear-resizes to
        (int(H*s), int(W*s)), pads bottom/right up to the next stride
        multiple with gray 0.447 (yolov5 scale_img), runs the network,
        de-scales predictions by the nominal s and de-flips against the
        original canvas width (yolov5 _descale_pred), then clips the
        augmented tails — the coarsest detect level of the unscaled
        pass and the finest level of the most-scaled pass
        (yolov5 _clip_augmented). All passes' predictions merge before
        one NMS, like the reference's concatenated TTA output entering
        its uncapped nms(). Cross-checked against a torch
        implementation of the same recipe in tests/test_tta_parity.py.
        """

        key = ('aug', batch_size, height, width)
        if key in self._compiled:
            return self._compiled[key]
        self._assert_trace_globals()

        config = self.config
        dtype = self.compute_dtype
        pre_nms_topk = self.pre_nms_topk
        max_det = self.max_det
        apply_fn = self._apply_fn
        stride = int(self.letterbox_stride)
        nl = int(getattr(self, '_tta_nl', len(config.strides)))

        passes = tta_passes(height, width, stride)
        fused = self._fused_decode
        approx_sel = self._approx_select
        select_cm = self._select_cm

        def program(params, images_u8, conf_thres, iou_thres):
            x = images_u8.astype(dtype) / dtype(255.0)
            if not fused:
                pred = tta_concatenated_predictions(
                    config, apply_fn, params, x, height, width,
                    stride, dtype, nl=nl)
                return batched_nms(pred, conf_thres, iou_thres,
                                   max_det=max_det,
                                   pre_nms_topk=pre_nms_topk)

            fused_cands = []
            for i_pass, (s, flip, sh, sw, ph, pw) in enumerate(passes):
                xi = _tta_transform_input(x, height, width, s, flip,
                                          sh, sw, ph, pw, dtype)
                heads = apply_fn(config, params, xi, dtype=dtype,
                                 decode=False)
                # _clip_augmented at the head level: skip the coarsest
                # level on the unscaled pass, the finest level on the
                # most-scaled pass
                lvl_slice = slice(None)
                if nl > 1:
                    if i_pass == 0:
                        lvl_slice = slice(0, nl - 1)
                    elif i_pass == len(passes) - 1:
                        lvl_slice = slice(1, None)
                c = select_topk_candidates(
                    heads[lvl_slice], config.anchors[lvl_slice],
                    config.strides[lvl_slice],
                    config.num_classes, conf_thres, pre_nms_topk,
                    approx=approx_sel, channel_major=select_cm)
                bx = c['boxes_cxcywh'] / jnp.float32(s)
                if flip:
                    cx = width - bx[..., 0]
                    bx = jnp.stack(
                        [cx, bx[..., 1], bx[..., 2], bx[..., 3]],
                        axis=-1)
                fused_cands.append(dict(c, boxes_cxcywh=bx))
            from megadetector_tpu.ops.decode import merge_candidates
            cands = merge_candidates(fused_cands, pre_nms_topk)
            return nms_on_candidates(
                cands, iou_thres, max_det=max_det,
                class_agnostic=(config.num_classes == 1))

        fn = self._jit(program)
        self._compiled[key] = fn
        return fn

    def _resize_dtype(self):
        """MXU operand dtype for the device-letterbox interpolation
        matmuls. A bf16 forward re-rounds the canvas to bf16 at its
        input cast anyway, and bf16 MXU operands run ~5x faster than
        emulated-f32 matmuls on v5e (accumulation stays f32 either
        way) — this was the 12% production-combo gap vs the
        post-letterbox bench. It IS numerics-changing (up to ~2/255
        pixel drift vs the f32 resize), so like every other
        reduction-order rewrite it is forced OFF in strict
        compatibility modes; the bf16_resize detector option opts the
        heuristic out elsewhere."""

        if 'strict' in self.compatibility_mode:
            return None
        if not _to_bool(self._options.get('bf16_resize', True)):
            return None
        dtype = self.compute_dtype
        return dtype if dtype == jnp.bfloat16 else None

    def _stem_layout_h2(self):
        """True when this detector's l0 kernel is h2+w4-folded
        ([3,3,24,*], ops/folding.fold_l0_h2) — the device letterbox
        then emits the folded stem layout directly."""

        node = self.params.get('l0') if isinstance(self.params, dict) \
            else None
        if not isinstance(node, dict):
            return False
        w = node.get('w', node.get('w_q'))
        return w is not None and tuple(w.shape[:3]) == (3, 3, 24)

    def _get_compiled_device_preprocess(self, batch_size, staging_hw,
                                        canvas_hw, scale_target,
                                        pre_nms_topk=None,
                                        identity=False):
        """Compiled program: staged uint8 -> letterbox -> forward -> NMS.

        staging_hw / canvas_hw are (h, w) tuples; scale_target is the
        square size the letterbox ratio derives from (see
        ops/preprocess_device.letterbox_one) so rectangular canvases
        reproduce the host letterbox(auto=True) geometry exactly.
        identity=True compiles the ratio-1 fast path (every image's
        content equals the canvas): slice + normalize, no resize —
        bit-identical to the letterbox at r=1, ~0.39 ms/img cheaper
        (experiments/exp_letterbox_profile.py).
        """

        pre_nms_topk = pre_nms_topk or self.pre_nms_topk
        staging_hw = tuple(int(v) for v in staging_hw)
        canvas_hw = tuple(int(v) for v in canvas_hw)
        key = ('dev', batch_size, staging_hw, canvas_hw, scale_target,
               pre_nms_topk, identity)
        if key in self._compiled:
            return self._compiled[key]
        self._assert_trace_globals()

        from megadetector_tpu.ops.preprocess_device import (
            fold_canvas_h2, letterbox_one)

        config = self.config
        dtype = self.compute_dtype
        max_det = self.max_det
        apply_fn = self._apply_fn

        fused = self._fused_decode
        approx_sel = self._approx_select
        select_cm = self._select_cm

        resize_dtype = self._resize_dtype()
        # With an h2-folded l0 (folded_h2 option), the letterbox emits
        # the folded stem layout itself — the relayout rides the
        # letterbox epilogue write (identity path: the u8 canvas, at
        # 1/4 the f32 traffic) instead of a standalone normalize-then-
        # transpose pair at the model input (VERDICT-r4 item 1)
        fold_layout = 'h2' if self._stem_layout_h2() else None

        def program(params, staged_u8, sizes, conf_thres, iou_thres):
            if identity:
                x = staged_u8[:, :canvas_hw[0], :canvas_hw[1], :]
                if fold_layout == 'h2':
                    x = fold_canvas_h2(x)
                x = x.astype(jnp.float32) / jnp.float32(255.0)
            else:
                x = jax.vmap(
                    lambda img, hw: letterbox_one(
                        img, hw[0], hw[1], canvas_hw,
                        scale_target=scale_target,
                        resize_dtype=resize_dtype,
                        fold_layout=fold_layout)
                )(staged_u8, sizes)
            if fused:
                heads = apply_fn(config, params, x.astype(dtype),
                                 dtype=dtype, decode=False)
                cands = select_topk_candidates(
                    heads, config.anchors, config.strides,
                    config.num_classes, conf_thres, pre_nms_topk,
                    approx=approx_sel, channel_major=select_cm)
                return nms_on_candidates(
                    cands, iou_thres, max_det=max_det,
                    class_agnostic=(config.num_classes == 1))
            pred = apply_fn(config, params, x.astype(dtype), dtype=dtype)
            return batched_nms(pred, conf_thres, iou_thres,
                               max_det=max_det, pre_nms_topk=pre_nms_topk)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P(self.batch_axis))
            replicated = NamedSharding(self.mesh, P())
            fn = self._jit(program,
                         in_shardings=(replicated, data, data, None, None),
                         out_shardings=NamedSharding(
                             self.mesh, P(self.batch_axis)))
        else:
            fn = self._jit(program)
        self._compiled[key] = fn
        return fn

    #%% Preprocessing

    def _auto_target_shape(self, shape_hw, image_size, scaleup=True):
        """The minimal stride-multiple canvas for this detector's
        stride (single source of truth: ops/boxes.auto_target_shape)."""

        return box_ops.auto_target_shape(
            shape_hw, image_size, stride=self.letterbox_stride,
            scaleup=scaleup)

    def _use_auto_canvas(self, shape_hw, image_size, scaleup=True):
        """
        True when this image should letterbox onto its minimal
        stride-rectangle canvas; False when canvas_mode is 'square' or
        the max_canvases compile-guard already tripped for a new shape.
        """

        if self.canvas_mode != 'auto':
            return False
        t = self._auto_target_shape(shape_hw, image_size, scaleup)
        if t == (image_size, image_size) or t in self._auto_canvases:
            return True
        if len(self._auto_canvases) >= self.max_canvases:
            return False
        self._auto_canvases.add(t)
        return True

    def preprocess_image(self, img_original, image_id='unknown',
                         image_size=None, verbose=False):
        """
        Letterbox an image (PIL or HWC numpy, RGB, EXIF-rotated) onto the
        fixed inference canvas. Returns a dict with the preprocessed uint8
        array and the geometry needed to map boxes back
        (reference protocol: pytorch_detector.py:964-1121).
        """

        result = {'file': image_id}

        img_original_pil = None
        if not isinstance(img_original, np.ndarray):
            img_original_pil = img_original
            img_original = np.asarray(img_original)

        scaling_shape = img_original.shape

        if image_size is not None:
            assert isinstance(image_size, int)
            if not self.printed_image_size_warning:
                print('Using user-supplied image size {}'.format(image_size))
                self.printed_image_size_warning = True
        else:
            image_size = self.default_image_size
            self.printed_image_size_warning = False

        if self.preprocess_mode == 'device' and \
                'classic' in self.compatibility_mode:
            # Device mode: the letterbox runs on the TPU; here we only
            # record the raw image plus the target canvas (geometry is
            # identical to the classic host letterbox for that canvas,
            # so downstream scale_coords is unchanged). Very large
            # images are host-shrunk first to
            # bound the staging canvas; normalized output coordinates are
            # scale-invariant, so scaling_shape tracks the shrunk image.
            max_side = int(
                getattr(self, 'max_staging_side', None) or 4096)
            original_shape = img_original.shape
            if max(img_original.shape[:2]) > max_side:
                img_original, _ = box_ops.resize_long_side(
                    img_original, max_side)
                scaling_shape = img_original.shape
            if self._use_auto_canvas(img_original.shape[:2], image_size):
                target = self._auto_target_shape(
                    img_original.shape[:2], image_size)
            else:
                target = (image_size, image_size)
            result['img_processed'] = None
            result['img_original'] = img_original
            result['img_original_pil'] = img_original_pil
            result['target_shape'] = target
            result['scale_target'] = image_size
            result['scaling_shape'] = scaling_shape
            # The TRUE source dims (include_image_size reports these;
            # scaling_shape tracks the shrunk staging image whose
            # normalized coordinates are scale-invariant)
            result['original_shape'] = original_shape
            result['letterbox_ratio'] = None
            result['letterbox_pad'] = None
            return result

        if 'classic' in self.compatibility_mode:
            # Classic: one letterbox straight to the target with
            # scale-up allowed — onto the minimal stride-multiple
            # rectangle in 'auto' canvas mode (the reference's exact
            # behavior, pytorch_detector.py:1064-1068) or the full
            # square canvas in 'square' mode
            auto = self._use_auto_canvas(img_original.shape[:2],
                                         image_size, scaleup=True)
            img, ratio, pad = box_ops.letterbox(
                img_original, new_shape=(image_size, image_size),
                stride=self.letterbox_stride, auto=auto, scaleup=True)
        else:
            # Modern: pre-resize long side (linear up / area down), then pad
            use_ceil = 'use_ceil_for_resize' in self.compatibility_mode
            img_resized, _ = box_ops.resize_long_side(
                img_original, image_size, use_ceil=use_ceil)
            auto = self._use_auto_canvas(img_resized.shape[:2],
                                         image_size, scaleup=False)
            img, ratio, pad = box_ops.letterbox(
                img_resized, new_shape=(image_size, image_size),
                stride=self.letterbox_stride, auto=auto, scaleup=False)
            img_original = img_resized

        result['img_processed'] = img
        result['img_original'] = img_original
        result['img_original_pil'] = img_original_pil
        result['target_shape'] = img.shape[:2]
        result['scaling_shape'] = scaling_shape
        result['letterbox_ratio'] = ratio
        result['letterbox_pad'] = pad
        return result

    def repreprocess_on_square_canvas(self, info, image_size=None):
        """
        Re-letterbox an already-preprocessed image onto the
        always-available square canvas. The batch driver uses this to
        merge small rect-canvas tail buckets into ONE program when
        batches pad to a mesh multiple: k tail buckets of n_i images
        would otherwise each pad to the device count (k * mesh_size
        slots for sum(n_i) images); merged onto the square canvas they
        run as a single padded batch. Returns a fresh
        preprocess_image() dict, or None when the original pixels are
        unavailable (e.g. native-loader infos that never materialized
        the full image).
        """

        source = info.get('img_original_pil')
        if source is None:
            source = info.get('img_original')
        if source is None:
            return None
        saved_mode = self.canvas_mode
        self.canvas_mode = 'square'
        try:
            new_info = self.preprocess_image(
                source, image_id=info.get('file', 'unknown'),
                image_size=image_size)
        finally:
            self.canvas_mode = saved_mode
        # Carry loader-attached fields (EXIF, timestamps) forward
        for key, value in info.items():
            if key not in new_info:
                new_info[key] = value
        return new_info

    #%% Inference

    def generate_detections_one_image(self, img_original, image_id='unknown',
                                      detection_threshold=0.00001,
                                      image_size=None, augment=False,
                                      verbose=False):
        """
        Run detection on one image; returns an MD-format image dict
        (reference protocol: pytorch_detector.py:1428-1482).
        """

        results = self.generate_detections_one_batch(
            [img_original], [image_id],
            detection_threshold=detection_threshold,
            image_size=image_size, augment=augment, verbose=verbose)
        return results[0]

    def generate_detections_one_batch(self, img_originals, image_ids=None,
                                      detection_threshold=0.00001,
                                      image_size=None, augment=False,
                                      verbose=False):
        """
        Run detection on a batch of images (PIL images, numpy arrays, or
        dicts from preprocess_image). Returns a list of MD-format image
        dicts with 'file', 'detections', 'max_detection_conf'
        (reference protocol: pytorch_detector.py:1124-1254).
        """

        if image_ids is None:
            image_ids = ['unknown'] * len(img_originals)
        assert len(img_originals) == len(image_ids)

        if augment and self.preprocess_mode == 'device':
            raise ValueError(
                'augment=True requires preprocess_mode=host (TTA rescales '
                'the letterboxed canvas, which device mode computes '
                'in-program)')

        results = [None] * len(img_originals)
        infos = []
        for idx, (img, image_id) in enumerate(zip(img_originals, image_ids)):
            if isinstance(img, dict):
                info = dict(img)
                if image_id is not None and image_id != 'unknown':
                    info['file'] = image_id
                infos.append((idx, info))
            elif img is None:
                results[idx] = {
                    'file': image_id,
                    'detections': None,
                    'failure': FAILURE_IMAGE_OPEN,
                }
            else:
                try:
                    info = self.preprocess_image(
                        img, image_id=image_id, image_size=image_size,
                        verbose=verbose)
                    infos.append((idx, info))
                except Exception as e:
                    if verbose:
                        print('Preprocess error for {}: {}'.format(
                            image_id, e))
                    results[idx] = {
                        'file': image_id,
                        'detections': None,
                        'failure': FAILURE_IMAGE_OPEN,
                    }

        # Group same-canvas images and run one compiled program per
        # canvas shape — the reference's shape-grouped batching
        # (pytorch_detector.py:1228-1251). With canvas_mode='square'
        # there is exactly one group.
        groups = {}
        for item in infos:
            shape = tuple(item[1].get('target_shape') or (0, 0))
            groups.setdefault(shape, []).append(item)

        for group in groups.values():
            try:
                self._run_batch(group, results, detection_threshold,
                                augment)
            except Exception as e:
                if isinstance(e, PROGRAMMING_ERRORS) and \
                        reraise_programming_errors():
                    raise
                # Failure containment is contractual (reference
                # pytorch_detector.py:1240-1249), but never silently:
                # one diagnostic line always, full trace when verbose
                print('Inference failure on batch of {}: {}'.format(
                    len(group), e))
                if verbose:
                    import traceback
                    traceback.print_exc()
                for idx, info in group:
                    results[idx] = {
                        'file': info['file'],
                        'detections': None,
                        'failure': FAILURE_INFER,
                    }

        return results

    def _run_batch(self, infos, results, detection_threshold, augment):
        """Stack preprocessed images, run the device program, emit dicts."""

        nms_iou = 0.45 if 'classic' in self.compatibility_mode else 0.6

        # The fixed-shape NMS truncates the candidate set to pre_nms_topk
        # before suppression (the reference nms() has no such cap,
        # pytorch_detector.py:502-610). At very low thresholds more
        # candidates than that can pass the objectness filter, silently
        # dropping the lowest-confidence detections. Warn once; callers
        # who need the deep tail can raise pre_nms_topk via
        # detector_options.
        # Escalation covers standard runs; TTA programs have a fixed
        # per-pass capacity (and disabled escalation), so the
        # low-threshold truncation warning stays live for augment runs
        if detection_threshold < 0.005 and self.pre_nms_topk < 2048 and \
                (augment or not self.auto_escalate_topk) and \
                not self._warned_low_threshold_topk:
            print('Warning: detection_threshold {} is very low but '
                  'pre_nms_topk is {}; detections beyond the top {} '
                  'candidates per image will be dropped (set the '
                  'pre_nms_topk detector option to keep more)'.format(
                      detection_threshold, self.pre_nms_topk,
                      self.pre_nms_topk))
            self._warned_low_threshold_topk = True

        # Pad partial batches by repeating the last image; padded slots
        # are dropped below (their `idx` is None)
        n_real = len(infos)
        target = n_real
        if self.pad_batches_to is not None and \
                n_real < self.pad_batches_to:
            target = self.pad_batches_to
        if self.mesh is not None:
            # The batch axis shards over the mesh, so it must be a
            # multiple of the device count
            n_dev = int(self.mesh.devices.size)
            target = ((target + n_dev - 1) // n_dev) * n_dev
        if target > n_real:
            infos = list(infos) + \
                [(None, infos[-1][1])] * (target - n_real)
        self.images_run += n_real
        self.slots_run += target
        self.programs_run += 1

        if self.preprocess_mode == 'device' and \
                infos[0][1].get('img_processed') is None:
            from megadetector_tpu.ops.preprocess_device import stage_images
            canvas = tuple(infos[0][1]['target_shape'])
            scale_target = int(infos[0][1].get('scale_target',
                                               max(canvas)))
            raw_imgs = [np.asarray(info['img_original'])
                        for _, info in infos]
            staged, sizes = stage_images(
                raw_imgs, multiple=self.staging_multiple)
            h, w = canvas

            # Identity fast path: when every image's content already
            # equals the canvas (common with DCT-scaled native decode
            # — e.g. a 2048x1536 source lands at exactly 1280x960 via
            # libjpeg scale 5/8), the letterbox ratio is exactly 1 and
            # the bilinear resize is an exact copy; the program then
            # skips the whole resize stage (hardware-profiled at
            # ~0.39 ms/img, experiments/exp_letterbox_profile.py) and
            # just slices + normalizes. Bit-identical output: at r=1
            # the interpolation weights are (1, 0) at integer source
            # positions and the padding is empty.
            # r = min(T/h, T/w) == 1 exactly iff T == max(canvas) when
            # content == canvas
            identity = scale_target == max(canvas) and \
                all(im.shape[:2] == canvas for im in raw_imgs)

            def run_program(topk=None):
                fn = self._get_compiled_device_preprocess(
                    staged.shape[0], staged.shape[1:3], canvas,
                    scale_target, pre_nms_topk=topk,
                    identity=identity)
                return fn(self.params, staged, sizes,
                          jnp.float32(detection_threshold),
                          jnp.float32(nms_iou))
        else:
            imgs = [info['img_processed'] for _, info in infos]
            h, w = imgs[0].shape[:2]
            for im in imgs:
                assert im.shape[:2] == (h, w), \
                    'Heterogeneous canvas in one batch'
            batch = np.stack(imgs).astype(np.uint8)
            if augment:
                fn_aug = self._get_compiled_augment(
                    batch.shape[0], h, w)

                def run_program(topk=None):
                    return fn_aug(self.params, batch,
                                  jnp.float32(detection_threshold),
                                  jnp.float32(nms_iou))
            else:
                def run_program(topk=None):
                    fn = self._get_compiled(batch.shape[0], h, w,
                                            pre_nms_topk=topk)
                    return fn(self.params, batch,
                              jnp.float32(detection_threshold),
                              jnp.float32(nms_iou))

        out = jax.device_get(run_program())

        # Candidate-capacity escalation: when more candidates pass the
        # floor than the fixed-shape selection can hold, re-run through
        # a program with the next power-of-two capacity so nothing is
        # dropped (the reference's nms() is uncapped,
        # pytorch_detector.py:502-610). Bounded by max_pre_nms_topk.
        topk = self.pre_nms_topk
        if not augment and self.auto_escalate_topk:
            while True:
                n_cand_now = out.get('n_candidates')
                if n_cand_now is None:
                    break
                needed = max(
                    (int(n_cand_now[s])
                     for s, (idx, _) in enumerate(infos)
                     if idx is not None), default=0)
                if needed <= topk or topk >= self.max_pre_nms_topk:
                    break
                new_topk = topk
                while new_topk < needed:
                    new_topk *= 2
                new_topk = min(new_topk, self.max_pre_nms_topk)
                if new_topk <= topk:
                    break
                # Subclasses with a discrete capacity set (AOT artifacts)
                # round up to the capacity that will actually execute, so
                # the loop never re-runs an identical program
                topk = self._effective_topk(new_topk)
                out = jax.device_get(run_program(topk))

        # TTA counts the same objects once per augmentation pass, so the
        # overflow indicator only applies to single-pass runs
        n_cand = None if augment else out.get('n_candidates', None)

        for slot, (idx, info) in enumerate(infos):
            if idx is None:
                continue  # batch-padding slot
            valid = out['valid'][slot]
            boxes = np.asarray(out['boxes'][slot][valid], np.float64)
            scores = np.asarray(out['scores'][slot][valid], np.float64)
            classes = np.asarray(out['classes'][slot][valid])

            scaling_shape = info['scaling_shape']
            detections = []
            max_conf = 0.0

            if boxes.shape[0] > 0:
                if 'classic' in self.compatibility_mode:
                    ratio_pad = None
                    # Loaders that never materialize the full-resolution
                    # image (native JPEG path) pass img_original=None;
                    # in classic mode its shape IS scaling_shape
                    img_orig = info.get('img_original')
                    img0_shape = img_orig.shape if img_orig is not None \
                        else scaling_shape
                else:
                    img_orig = info['img_original']
                    ratio = (img_orig.shape[0] / scaling_shape[0],
                             img_orig.shape[1] / scaling_shape[1])
                    ratio_pad = (ratio, info['letterbox_pad'])
                    img0_shape = scaling_shape

                boxes = box_ops.scale_coords(
                    (h, w), boxes, img0_shape, ratio_pad).round()

                gn = np.array([scaling_shape[1], scaling_shape[0],
                               scaling_shape[1], scaling_shape[0]],
                              dtype=np.float64)

                # The reference emits detections in reversed prediction
                # order, i.e. ascending confidence
                # (pytorch_detector.py:1383 `for ... in reversed(det)`);
                # match it so raw-API consumers see identical ordering
                # (the file writer conf-sorts either way)
                for i in reversed(range(boxes.shape[0])):
                    conf = float(scores[i])
                    if conf < detection_threshold:
                        continue
                    xywh = (box_ops.xyxy2xywh(boxes[i:i + 1]) / gn)[0]
                    api_box = ct_utils.convert_yolo_to_xywh(list(xywh))

                    if 'classic' in self.compatibility_mode:
                        api_box = ct_utils.truncate_float_array(
                            api_box, precision=COORD_DIGITS)
                        conf = ct_utils.truncate_float(
                            conf, precision=CONF_DIGITS)
                    else:
                        api_box = ct_utils.round_float_array(
                            api_box, precision=COORD_DIGITS)
                        conf = ct_utils.round_float(
                            conf, precision=CONF_DIGITS)

                    if not self.use_model_native_classes:
                        cls = int(classes[i]) + 1
                        if cls not in (1, 2, 3):
                            raise KeyError(
                                '{} is not a valid class.'.format(cls))
                    else:
                        cls = int(classes[i])

                    detections.append({
                        'category': str(cls),
                        'conf': conf,
                        'bbox': api_box,
                    })
                    max_conf = max(max_conf, conf)

            results[idx] = {
                'file': info['file'],
                'detections': detections,
                'max_detection_conf': max_conf,
            }

            # Guarantee the 0.005-floor contract is observable: after
            # any capacity escalation, a count still above the final
            # capacity means the tail was truncated relative to the
            # reference's uncapped nms() (run_detector.py:251). Flag
            # the image and say so (first few occurrences).
            if n_cand is not None and int(n_cand[slot]) > topk:
                results[idx]['pre_nms_truncation'] = int(n_cand[slot])
                self.n_truncated_images += 1
                if self.n_truncated_images <= 3:
                    print('Warning: image {} had {} candidates above '
                          'the confidence floor but the candidate '
                          'capacity is {}; lowest-confidence '
                          'detections were dropped (raise the '
                          'max_pre_nms_topk detector option to keep '
                          'them)'.format(
                              info['file'], int(n_cand[slot]), topk))


def tta_passes(height, width, stride):
    """The reference TTA pass table (scale, flip, scaled_h, scaled_w,
    padded_h, padded_w): (1, no), (0.83, hflip), (0.67, no), scaled
    dims int()-floored and padded up to the next stride multiple
    (yolov5 forward_augment + scale_img)."""

    import math

    passes = [(1.0, False, height, width, height, width)]
    for s, flip in ((0.83, True), (0.67, False)):
        sh, sw = int(height * s), int(width * s)
        ph = int(math.ceil(sh / stride) * stride)
        pw = int(math.ceil(sw / stride) * stride)
        passes.append((s, flip, sh, sw, ph, pw))
    return passes


def _tta_transform_input(x, height, width, s, flip, sh, sw, ph, pw,
                         dtype):
    """One TTA pass's input transform: flip the ORIGINAL canvas, then
    bilinear-resize (no antialiasing — torch F.interpolate semantics),
    then pad bottom/right with gray 0.447 (yolov5 scale_img)."""

    xi = x[:, :, ::-1, :] if flip else x
    if (sh, sw) != (height, width):
        xi = jax.image.resize(
            xi, (x.shape[0], sh, sw, x.shape[3]),
            method='bilinear', antialias=False).astype(dtype)
    if (ph, pw) != (sh, sw):
        xi = jnp.pad(xi, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                     constant_values=dtype(0.447))
    return xi


def tta_concatenated_predictions(config, apply_fn, params, x, height,
                                 width, stride, dtype, nl=None):
    """
    The full reference TTA prediction assembly on decoded outputs:
    per-pass input transform, forward, de-scale by the nominal scale,
    de-flip against the original canvas width (yolov5 _descale_pred),
    clip the augmented tails (yolov5 _clip_augmented with its default
    exclude-layer count of 1: drop the coarsest detect level's rows
    from the unscaled pass and the finest level's rows from the
    most-scaled pass; levels are concatenated finest-first, so those
    are the tail/head row blocks), concatenate. [nl] is the number of
    detect levels (default from config.strides; pass 1 for single-level
    stand-ins, which disables clipping). Returns [B, A_total, 5+C].

    Module-level so tests can compare these raw predictions against an
    independent torch implementation without NMS ambiguity.
    """

    if nl is None:
        nl = len(config.strides)
    passes = tta_passes(height, width, stride)
    g = sum(4 ** k for k in range(nl))

    preds = []
    for i_pass, (s, flip, sh, sw, ph, pw) in enumerate(passes):
        xi = _tta_transform_input(x, height, width, s, flip, sh, sw,
                                  ph, pw, dtype)
        p = apply_fn(config, params, xi, dtype=dtype)
        boxes = p[..., :4] / jnp.float32(s)
        if flip:
            cx = width - boxes[..., 0]
            boxes = jnp.concatenate([cx[..., None], boxes[..., 1:]],
                                    axis=-1)
        p = jnp.concatenate([boxes, p[..., 4:]], axis=-1)
        if nl > 1:
            a = p.shape[1]
            if i_pass == 0:
                p = p[:, : a - a // g]
            elif i_pass == len(passes) - 1:
                p = p[:, (a // g) * (4 ** (nl - 1)):]
        preds.append(p)
    return jnp.concatenate(preds, axis=1)


def _parse_compiler_options(spec):
    """
    Parse the xla_compiler_options detector option into the dict
    jax.jit(compiler_options=...) takes: 'name=value[;name=value...]'
    (';'-separated because --detector_options tokens are themselves
    key=value and split on the FIRST '=' only), or an already-built
    mapping. Returns None for empty/None so the default compiler path
    stays literally untouched.
    """

    def _norm(v):
        # XLA's option parser takes bool options as Python bools (or
        # 'True'/'False' strings) but rejects lowercase 'true'/'false'
        # and '0'/'1'; normalize the spellings detector options use
        if isinstance(v, bool):
            return v
        s = str(v)
        if s.lower() == 'true':
            return True
        if s.lower() == 'false':
            return False
        return s

    if spec is None:
        return None
    if isinstance(spec, dict):
        parsed = {str(k): _norm(v) for k, v in spec.items()}
        return parsed or None
    parsed = {}
    for item in str(spec).split(';'):
        item = item.strip()
        if not item:
            continue
        if '=' not in item:
            raise ValueError(
                "xla_compiler_options items must be name=value, got "
                "{!r} (full spec {!r})".format(item, spec))
        k, v = item.split('=', 1)
        parsed[k.strip()] = _norm(v.strip())
    return parsed or None


def _to_bool(v):
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ('true', '1', 'yes'):
        return True
    if s in ('false', '0', 'no', ''):
        return False
    # A garbage boolean silently meaning False is dangerous: a quoted
    # --detector_options "force_cpu=true conv_backend=pallas" parses as
    # force_cpu='true conv_backend=pallas' and would silently run on
    # the accelerator. Options are space-separated k=v tokens.
    raise ValueError(
        "Unrecognized boolean option value {!r}; use true/false "
        "(detector options are space-separated key=value tokens, e.g. "
        "--detector_options force_cpu=true conv_backend=pallas)".format(v))
