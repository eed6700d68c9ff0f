"""
Species classifier wrapper: batched crop classification on TPU.

Plays the role of the reference's SpeciesNet classifier stage
(megadetector/detection/run_md_and_speciesnet.py:782 runs the classifier
forward on batches of preprocessed crops). Checkpoints are .npz pytrees
(see models/convert_weights.py) with metadata carrying class names, input
size, and normalization constants; the network is the EfficientNetV2
family (models/efficientnet.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from megadetector_tpu.models import efficientnet
from megadetector_tpu.models.convert_weights import load_checkpoint


class SpeciesClassifier:
    """
    Batched image classifier.

    Classifier options:
        dtype: 'float32' (default) or 'bfloat16'
        image_size: input side (default from metadata, else 480)
        crop_mode: 'stretch' (resize bbox crop to the square input,
            SpeciesNet-style) or 'pad' (letterbox the crop)
        folded_stem: 'auto' (default; folds 'w2' when image_size is
            even), 'w2', 'w4', or 'off' — width-fold the stem conv for
            MXU lane utilization (efficientnet.fold_stem; exact kernel
            rewrite; hardware A/B in experiments/exp_clf_stem_e2e.py:
            w2 +4.0% / w4 +3.3% e2e at 480px b128, so auto picks w2)
        quantize: 'off' (default) or 'int8' — chained int8 inference
            (efficientnet.quantize_params_chain): expand/project/head
            convs run int8 on the MXU with the residual stream stored
            int8; dw/SE/stem/fc stay float. Activation scales are
            calibrated on the FIRST classified batch by default (that
            batch also classifies through the calibrated program, so
            results are consistent across the run), or explicitly via
            calibrate(crops) with representative data.
            MEASURED DESIGN POINT, not a speed mode on this hardware:
            e2e V2-M 480px b128 on v5e it LOSES −6.1% (fused stages
            only) to −21.7% (all stages) vs bf16
            (experiments/exp_clf_int8.py; perf-profile.md ledger) —
            the float dw/SE break the int8 chain at every MBConv
            block, so the HBM-bound e6 expansion tensors pay an extra
            activation-quantize pass, unlike the detector's unbroken
            conv→conv chains where int8 wins. Kept for toolchains /
            future hardware where the trade flips; class probabilities
            also drift vs the float path — validate against
            real-weight goldens before any production use.
        calibration_headroom: absmax multiplier for the int8 activation
            scales (default 1.0)
    """

    KNOWN_OPTIONS = ('arch', 'num_classes', 'image_size', 'crop_mode',
                     'folded_stem', 'dtype', 'quantize',
                     'calibration_headroom')

    def __init__(self, model_path, classifier_options=None, verbose=False):

        options = dict(classifier_options or {})
        unknown = sorted(set(options) - set(self.KNOWN_OPTIONS))
        if unknown:
            raise ValueError(
                'Unknown classifier option(s) {} (known: {})'.format(
                    unknown, list(self.KNOWN_OPTIONS)))
        self.verbose = verbose

        params, metadata = load_checkpoint(model_path)
        self.metadata = metadata or {}

        arch = options.get('arch',
                           self.metadata.get('arch', 'efficientnetv2_m'))
        num_classes = int(self.metadata.get('num_classes',
                                            options.get('num_classes', 0)))
        if num_classes == 0:
            # Infer from the fc weights
            num_classes = params['fc']['w'].shape[-1]

        self.config = efficientnet.EfficientNetConfig(
            arch, num_classes=num_classes)
        self.image_size = int(options.get(
            'image_size', self.metadata.get('image_size', 480)))
        self.class_names = self.metadata.get(
            'class_names',
            ['class_{}'.format(i) for i in range(num_classes)])
        self.crop_mode = options.get('crop_mode', 'stretch')

        # Normalization applied on device (defaults: [0,1] scaling only,
        # matching SpeciesNet's preprocessing)
        self.mean = np.asarray(
            self.metadata.get('normalization_mean', [0.0, 0.0, 0.0]),
            np.float32)
        self.std = np.asarray(
            self.metadata.get('normalization_std', [1.0, 1.0, 1.0]),
            np.float32)

        fold = options.get('folded_stem', 'auto')
        if fold in ('auto', True):
            fold = 'w2' if self.image_size % 2 == 0 else 'off'
        if fold not in ('off', False, 'w2', 'w4'):
            raise ValueError(
                'folded_stem must be auto/off/w2/w4, got {!r}'.format(
                    options.get('folded_stem')))
        if fold in ('w2', 'w4') and not efficientnet.stem_is_folded(
                params):
            assert self.image_size % (2 if fold == 'w2' else 4) == 0, \
                'folded_stem={} requires image_size divisible by ' \
                'the fold'.format(fold)
            params = efficientnet.fold_stem(params, mode=fold)

        quantize = options.get('quantize', 'off')
        if quantize in (False, None, 'off'):
            quantize = 'off'
        elif quantize not in ('int8',):
            raise ValueError(
                "quantize must be 'off' or 'int8', got {!r}".format(
                    quantize))
        self.quantize = quantize
        self.calibration_headroom = float(
            options.get('calibration_headroom', 1.0))

        # int8 mode defaults the float-part compute dtype to bf16
        dtype_name = options.get(
            'dtype', 'bfloat16' if quantize == 'int8' else 'float32')
        self.compute_dtype = {'float32': jnp.float32,
                              'bfloat16': jnp.bfloat16,
                              'bf16': jnp.bfloat16}[dtype_name]

        if quantize == 'int8':
            if not efficientnet.params_are_chain_quantized(params):
                params = efficientnet.quantize_params_chain(
                    params, self.config)
            else:
                from megadetector_tpu.ops.quantization import \
                    requalify_quantized
                params = requalify_quantized(params)
            # Float leaves stay f32 on device; apply() casts the float
            # convs to compute_dtype at trace time (they are a small
            # minority of the weights in chain mode). Calibration also
            # needs f32 weights.
            self.params = jax.device_put(params)
            self._calibrated = self._chain_is_calibrated(self.params)
        else:
            if self.compute_dtype == jnp.bfloat16:
                params = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.bfloat16), params)
            else:
                params = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.float32), params)
            self.params = jax.device_put(params)
            self._calibrated = True

        self._compiled = {}

    @staticmethod
    def _chain_is_calibrated(params):
        nodes = []

        def walk(node):
            if isinstance(node, dict):
                if 'w_q' in node:
                    nodes.append(node)
                else:
                    for v in node.values():
                        walk(v)
        walk(params)
        return bool(nodes) and all('y_scale' in n for n in nodes)

    def calibrate(self, crops):
        """
        Bake static int8 activation scales from representative crops
        (list of HWC uint8 arrays, or a stacked [N, H, W, 3] uint8
        batch). Only meaningful with quantize='int8'; classify_batch
        auto-calibrates on its first batch if this was never called.
        """

        assert self.quantize == 'int8', \
            'calibrate() requires quantize=int8'
        if isinstance(crops, np.ndarray) and crops.ndim == 4:
            batch = crops
        else:
            s = self.image_size
            batch = np.stack([
                c if (c.shape[0] == s and c.shape[1] == s)
                else self.preprocess_crop(c) for c in crops])
        x = (batch.astype(np.float32) / 255.0 - self.mean) / self.std

        from megadetector_tpu.ops.quantization import \
            calibrate_chain_scales
        calibrate_chain_scales(
            efficientnet.apply, self.config, self.params, x,
            headroom=self.calibration_headroom)
        self._calibrated = True
        self._compiled.clear()
        if self.verbose:
            print('Calibrated int8 scales on {} crops'.format(
                batch.shape[0]))

    def _get_compiled(self, batch_size):
        if batch_size in self._compiled:
            return self._compiled[batch_size]

        config = self.config
        dtype = self.compute_dtype
        mean = jnp.asarray(self.mean)
        std = jnp.asarray(self.std)

        def program(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            logits = efficientnet.apply(config, params, x, dtype=dtype)
            return jax.nn.softmax(logits, axis=-1)

        fn = jax.jit(program)
        self._compiled[batch_size] = fn
        return fn

    def preprocess_crop(self, crop):
        """HWC uint8 crop -> [image_size, image_size, 3] uint8."""

        import cv2
        s = self.image_size
        if self.crop_mode == 'stretch':
            return cv2.resize(crop, (s, s),
                              interpolation=cv2.INTER_LINEAR)
        # 'pad': letterbox into the square
        from megadetector_tpu.ops.boxes import letterbox
        out, _, _ = letterbox(crop, (s, s), auto=False, scaleup=True)
        return out

    def classify_batch_async(self, crops, pad_to=None):
        """
        Dispatch one classifier batch WITHOUT blocking on the result.
        Returns an opaque handle for fetch_batch(); jax dispatch is
        async, so the host can stage/assemble the next batch (and the
        crop producers keep decoding) while this one computes — the
        two-stage driver keeps one batch in flight
        (run_md_and_classifier._consume_crop_queue), measured worth
        +6-57% on host-staged batches (experiments/exp_clf_staging.py).

        pad_to: when set, pad the batch with zero crops up to this size
        so one compiled program serves every flush — without it, each
        distinct tail-batch size triggers its own XLA compile.
        """

        if len(crops) == 0:
            return (None, 0)

        s = self.image_size
        processed = []
        for crop in crops:
            if crop.shape[0] != s or crop.shape[1] != s:
                crop = self.preprocess_crop(crop)
            processed.append(crop)
        batch = np.stack(processed).astype(np.uint8)

        n = batch.shape[0]
        if pad_to is not None and n < pad_to:
            batch = np.concatenate(
                [batch, np.zeros((pad_to - n,) + batch.shape[1:],
                                 np.uint8)], axis=0)

        if not self._calibrated:
            # First batch in int8 mode: bake activation scales from it,
            # then classify it through the calibrated chain program so
            # every batch in the run uses identical numerics.
            self.calibrate(batch[:n])

        fn = self._get_compiled(batch.shape[0])
        return (fn(self.params, batch), n)

    def fetch_batch(self, handle):
        """Block on a classify_batch_async() handle; returns
        [N, num_classes] numpy probabilities."""

        probs, n = handle
        if probs is None:
            return np.zeros((0, self.config.num_classes), np.float32)
        return np.asarray(jax.device_get(probs), np.float32)[:n]

    def classify_batch(self, crops, pad_to=None):
        """
        Classify a list of HWC uint8 crops (pre-resized or raw). Returns
        [N, num_classes] numpy probabilities. Synchronous wrapper around
        classify_batch_async + fetch_batch.
        """

        return self.fetch_batch(self.classify_batch_async(
            crops, pad_to=pad_to))

    def top_k(self, probs, k=5):
        """[(class_id_str, conf), ...] descending, for one probs row."""

        order = np.argsort(-probs)[:k]
        return [[str(int(i)), float(probs[i])] for i in order]


def extract_crop(image_np, bbox_norm, expansion=0.0, square=False):
    """
    Extract a detection crop from an HWC image given a normalized MD
    bbox [x, y, w, h]. [expansion] grows the box by that fraction per
    side; [square] expands the short side to make the crop square.
    Returns the crop (may be empty for degenerate boxes).
    """

    img_h, img_w = image_np.shape[:2]
    x, y, w, h = bbox_norm
    x0 = x * img_w
    y0 = y * img_h
    x1 = (x + w) * img_w
    y1 = (y + h) * img_h

    if expansion > 0:
        dx = (x1 - x0) * expansion
        dy = (y1 - y0) * expansion
        x0 -= dx
        x1 += dx
        y0 -= dy
        y1 += dy

    if square:
        bw = x1 - x0
        bh = y1 - y0
        if bw > bh:
            pad = (bw - bh) / 2
            y0 -= pad
            y1 += pad
        else:
            pad = (bh - bw) / 2
            x0 -= pad
            x1 += pad

    x0 = int(max(0, np.floor(x0)))
    y0 = int(max(0, np.floor(y0)))
    x1 = int(min(img_w, np.ceil(x1)))
    y1 = int(min(img_h, np.ceil(y1)))
    return image_np[y0:y1, x0:x1]
