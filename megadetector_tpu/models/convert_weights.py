"""
Offline weight conversion: reference torch checkpoints -> TPU-native
parameter pytrees (.npz + metadata.json).

The reference loads pickled YOLOv5 nn.Modules at serving time, requiring the
yolov5 package for unpickling (megadetector/detection/pytorch_detector.py:
265-497 does sys.modules surgery for exactly this reason). The TPU framework
instead converts once, offline: torch state dicts are extracted (via a
stub-unpickler so the original training repo does NOT need to be installed),
BatchNorm is folded into conv weights (the reference equivalently calls
.fuse() at load, pytorch_detector.py:929), tensors are transposed
OIHW -> HWIO for NHWC TPU convolutions, and the result is written as a flat
.npz plus a metadata.json carrying the model version, class names, anchors
and input size. Serving never imports torch.
"""

import io
import json
import os
import pickle
import zipfile

import numpy as np

from megadetector_tpu.models.yolov5 import YoloV5Config


#%% Pytree <-> flat-dict plumbing


def flatten_params(params, prefix='', out=None):
    """Nested-dict pytree -> {'a/b/c': ndarray} flat dict."""

    if out is None:
        out = {}
    for k, v in params.items():
        path = '{}/{}'.format(prefix, k) if prefix else k
        if isinstance(v, dict):
            flatten_params(v, path, out)
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_params(flat):
    """{'a/b/c': ndarray} -> nested-dict pytree."""

    params = {}
    for path, v in flat.items():
        parts = path.split('/')
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params


def save_checkpoint(params, path, metadata=None):
    """
    Save a parameter pytree as .npz, with a metadata.json sidecar
    ('<path minus .npz>.metadata.json').
    """

    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    if metadata is not None:
        meta_path = os.path.splitext(path)[0] + '.metadata.json'
        with open(meta_path, 'w') as f:
            json.dump(metadata, f, indent=1)
    return path


def load_checkpoint(path):
    """
    Load a converted checkpoint. Returns (params, metadata-or-None).
    Accepts an .npz file or a directory containing weights.npz+metadata.json.
    """

    if os.path.isdir(path):
        npz_path = os.path.join(path, 'weights.npz')
        meta_path = os.path.join(path, 'metadata.json')
    else:
        npz_path = path
        meta_path = os.path.splitext(path)[0] + '.metadata.json'

    with np.load(npz_path) as data:
        flat = {k: data[k] for k in data.files}
    params = unflatten_params(flat)

    # Chained-int8 nodes need their static scales rehydrated as Python
    # floats (pytree aux data) rather than 0-d array leaves
    from megadetector_tpu.ops.quantization import requalify_quantized
    params = requalify_quantized(params)

    metadata = None
    if os.path.isfile(meta_path):
        with open(meta_path, 'r') as f:
            metadata = json.load(f)
    return params, metadata


#%% Torch-state-dict extraction without the training repo


class _StubModule:
    """Generic stand-in for any class the checkpoint pickle references."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


def _make_stub_class(module, name):
    return type(name, (_StubModule,), {'__module__': module})


def extract_torch_state_dict(checkpoint_path, verbose=False):
    """
    Extract {name: numpy array} from a torch checkpoint WITHOUT requiring
    the original model repo: unknown pickle classes resolve to stubs, and
    the nn.Module object graph is walked manually via _parameters /
    _buffers / _modules.

    Returns (state_dict, extras) where extras carries useful scalars found
    in the checkpoint (class names, anchors, stride) when present.
    """

    import torch

    class _ShimUnpickler(pickle.Unpickler):

        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                if verbose:
                    print('Stubbing {}.{}'.format(module, name))
                return _make_stub_class(module, name)

    def _shim_load(f, **kwargs):
        return _ShimUnpickler(f).load()

    shim_pickle = type(pickle)('shim_pickle')
    shim_pickle.Unpickler = _ShimUnpickler
    shim_pickle.load = _shim_load
    shim_pickle.loads = lambda b, **kw: _ShimUnpickler(
        io.BytesIO(b)).load()

    ckpt = torch.load(checkpoint_path, map_location='cpu',
                      pickle_module=shim_pickle, weights_only=False)

    model_obj = None
    extras = {}
    if isinstance(ckpt, dict):
        # Harvest top-level training-config blocks (RF-DETR stores an
        # 'args' Namespace / 'model_config' dict carrying resolution
        # and class names next to the weights)
        for cfg_key in ('args', 'model_config', 'config'):
            cfg = ckpt.get(cfg_key)
            if cfg is None:
                continue
            cfg_dict = cfg if isinstance(cfg, dict) else \
                getattr(cfg, '__dict__', {})
            clean = {}
            for k, v in dict(cfg_dict).items():
                try:
                    if hasattr(v, 'tolist'):
                        v = v.tolist()
                    json.dumps(v)
                    clean[k] = v
                except (TypeError, ValueError):
                    pass
            if clean:
                extras['model_config'] = clean
                break
        for key in ('model', 'ema'):
            if key in ckpt and ckpt[key] is not None:
                model_obj = ckpt[key]
                break
        if model_obj is None and all(
                hasattr(v, 'shape') for v in ckpt.values()):
            # Plain state dict
            return ({k: _to_numpy(v) for k, v in ckpt.items()}, extras)
    else:
        model_obj = ckpt

    assert model_obj is not None, \
        'Could not find a model object in {}'.format(checkpoint_path)

    state = {}
    _walk_module(model_obj, '', state)

    # Harvest metadata commonly attached to YOLO model objects
    d = getattr(model_obj, '__dict__', {})
    names = d.get('names', None)
    if names is not None:
        extras['names'] = names if isinstance(names, (list, dict)) \
            else list(names)
    for attr in ('stride', 'nc', 'yaml'):
        if attr in d:
            try:
                v = d[attr]
                if hasattr(v, 'tolist'):
                    v = v.tolist()
                json.dumps(v)
                extras[attr] = v
            except (TypeError, ValueError):
                pass

    return state, extras


def _to_numpy(t):
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def _walk_module(obj, prefix, out):
    """Recursively collect parameters/buffers from a (stubbed) nn.Module."""

    d = getattr(obj, '__dict__', None)
    if d is None:
        return
    for group in ('_parameters', '_buffers'):
        tensors = d.get(group, None)
        if isinstance(tensors, dict):
            for name, t in tensors.items():
                if t is not None and hasattr(t, 'shape'):
                    key = '{}.{}'.format(prefix, name) if prefix else name
                    out[key] = _to_numpy(t)
    modules = d.get('_modules', None)
    if isinstance(modules, dict):
        for name, child in modules.items():
            if child is None:
                continue
            child_prefix = '{}.{}'.format(prefix, name) if prefix else name
            _walk_module(child, child_prefix, out)


#%% BN fusion and layout conversion


def fuse_conv_bn(conv_w, bn_weight, bn_bias, bn_mean, bn_var, eps=1e-3):
    """
    Fold BatchNorm into conv weights. conv_w is OIHW; returns (w, b) with w
    still OIHW. YOLOv5 BatchNorm uses eps=1e-3.
    """

    scale = bn_weight / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]
    b = bn_bias - bn_mean * scale
    return w, b


def _oihw_to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0))


class _TorchKeyReader:
    """Pulls fused (HWIO weight, bias) pairs out of a torch state dict."""

    def __init__(self, state_dict):
        # Normalize prefixes: strip leading 'model.' wrappers so keys start
        # with the layer index ('0.conv.weight', '24.m.0.weight', ...)
        self.sd = {}
        for k, v in state_dict.items():
            key = k
            while key.startswith('model.'):
                key = key[len('model.'):]
            self.sd[key] = v
        self.used = set()

    def conv(self, base):
        """
        Fused conv weights at [base] (e.g. '0' or '2.cv1'). Handles both
        already-fused checkpoints (conv.weight + conv.bias) and unfused ones
        (conv.weight + bn.*).
        """

        wk = base + '.conv.weight'
        assert wk in self.sd, 'Missing key {}'.format(wk)
        w = self.sd[wk]
        self.used.add(wk)
        bk = base + '.conv.bias'
        bnk = base + '.bn.weight'
        if bnk in self.sd:
            bn_w = self.sd[base + '.bn.weight']
            bn_b = self.sd[base + '.bn.bias']
            bn_m = self.sd[base + '.bn.running_mean']
            bn_v = self.sd[base + '.bn.running_var']
            for suffix in ('.bn.weight', '.bn.bias', '.bn.running_mean',
                           '.bn.running_var', '.bn.num_batches_tracked'):
                self.used.add(base + suffix)
            w, b = fuse_conv_bn(w, bn_w, bn_b, bn_m, bn_v)
        elif bk in self.sd:
            b = self.sd[bk]
            self.used.add(bk)
        else:
            b = np.zeros(w.shape[0], dtype=w.dtype)
        return {'w': _oihw_to_hwio(np.asarray(w, np.float32)),
                'b': np.asarray(b, np.float32)}

    def plain_conv(self, base):
        """Unwrapped conv (detect heads): weight+bias directly at [base]."""

        w = np.asarray(self.sd[base + '.weight'], np.float32)
        b = np.asarray(self.sd[base + '.bias'], np.float32)
        self.used.add(base + '.weight')
        self.used.add(base + '.bias')
        return {'w': _oihw_to_hwio(w), 'b': b}

    def get(self, key, default=None):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        return default


def convert_yolov5_state_dict(state_dict, config):
    """
    Map a YOLOv5 torch state dict onto the layer structure of [config]
    (a YoloV5Config). Returns (params pytree, anchors ndarray or None).
    """

    reader = _TorchKeyReader(state_dict)
    params = {}
    anchors = None

    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        base = str(i)
        if kind == 'conv':
            params[name] = reader.conv(base)
        elif kind == 'c3':
            node = {
                'cv1': reader.conv(base + '.cv1'),
                'cv2': reader.conv(base + '.cv2'),
                'cv3': reader.conv(base + '.cv3'),
            }
            for j in range(entry['n']):
                node['m{}'.format(j)] = {
                    'cv1': reader.conv('{}.m.{}.cv1'.format(base, j)),
                    'cv2': reader.conv('{}.m.{}.cv2'.format(base, j)),
                }
            params[name] = node
        elif kind == 'sppf':
            params[name] = {
                'cv1': reader.conv(base + '.cv1'),
                'cv2': reader.conv(base + '.cv2'),
            }
        elif kind == 'detect':
            heads = {}
            for lvl in range(len(entry['frm'])):
                heads['m{}'.format(lvl)] = reader.plain_conv(
                    '{}.m.{}'.format(base, lvl))
            params[name] = heads
            # anchors buffer is stored grid-relative (divided by stride);
            # convert back to pixels
            raw_anchors = reader.get(base + '.anchors')
            if raw_anchors is not None:
                a = np.asarray(raw_anchors, np.float32)
                strides = np.asarray(config.strides, np.float32)
                anchors = a * strides[:, None, None]
        # 'up'/'cat' have no parameters

    return params, anchors


def convert_rfdetr_state_dict(state_dict, config):
    """
    Map an RF-DETR torch state dict (HF Dinov2WithRegisters backbone
    naming + LW-DETR transformer naming; see
    megadetector/detection/rfdetr_detector.py:34-141 for the reference
    loader this replaces) onto the models/rfdetr.py param structure.
    Returns the params pytree.
    """

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {'w': sd[prefix + '.weight'].T.astype(np.float32),
                'b': sd[prefix + '.bias'].astype(np.float32)}

    def ln(prefix):
        return {'g': sd[prefix + '.weight'].astype(np.float32),
                'b': sd[prefix + '.bias'].astype(np.float32)}

    def conv(prefix):
        # torch OIHW -> HWIO
        return {'w': sd[prefix + '.weight'].transpose(2, 3, 1, 0)
                .astype(np.float32),
                'b': sd[prefix + '.bias'].astype(np.float32)}

    def mlp3(prefix):
        return {'l{}'.format(i): lin('{}.layers.{}'.format(prefix, i))
                for i in range(3)}

    enc = 'backbone.0.encoder'
    emb = enc + '.embeddings'
    c = config

    blocks = []
    for i in range(c.vit_depth):
        base = '{}.encoder.layer.{}'.format(enc, i)
        att = base + '.attention.attention'
        q = lin(att + '.query')
        k = lin(att + '.key')
        v = lin(att + '.value')
        blocks.append({
            'norm1': ln(base + '.norm1'),
            'qkv': {'w': np.concatenate([q['w'], k['w'], v['w']],
                                        axis=1),
                    'b': np.concatenate([q['b'], k['b'], v['b']])},
            'proj': lin(base + '.attention.output.dense'),
            'ls1': {'g': sd[base + '.layer_scale1.lambda1']
                    .astype(np.float32)},
            'norm2': ln(base + '.norm2'),
            'fc1': lin(base + '.mlp.fc1'),
            'fc2': lin(base + '.mlp.fc2'),
            'ls2': {'g': sd[base + '.layer_scale2.lambda1']
                    .astype(np.float32)},
        })

    dec_layers = []
    i = 0
    while 'transformer.decoder.layers.{}.norm1.weight'.format(i) in sd:
        base = 'transformer.decoder.layers.{}'.format(i)
        in_w = sd[base + '.self_attn.in_proj_weight']
        in_b = sd[base + '.self_attn.in_proj_bias']
        dec_layers.append({
            'self_qkv': {'w': in_w.T.astype(np.float32),
                         'b': in_b.astype(np.float32)},
            'self_proj': lin(base + '.self_attn.out_proj'),
            'norm1': ln(base + '.norm1'),
            'sampling_offsets': lin(base + '.cross_attn'
                                    '.sampling_offsets'),
            'attention_weights': lin(base + '.cross_attn'
                                     '.attention_weights'),
            'value_proj': lin(base + '.cross_attn.value_proj'),
            'output_proj': lin(base + '.cross_attn.output_proj'),
            'norm2': ln(base + '.norm2'),
            'linear1': lin(base + '.linear1'),
            'linear2': lin(base + '.linear2'),
            'norm3': ln(base + '.norm3'),
        })
        i += 1

    params = {
        'patch_embed': conv(emb + '.patch_embeddings.projection'),
        'cls_token': sd[emb + '.cls_token'].astype(np.float32),
        'register_tokens': sd[emb + '.register_tokens']
        .astype(np.float32),
        'pos_embed': sd[emb + '.position_embeddings']
        .astype(np.float32),
        'blocks': {'b{}'.format(k): blk
                   for k, blk in enumerate(blocks)},
        'out_norms': {
            'n{}'.format(k): ln('backbone.0.out_norms.{}'.format(k))
            for k in range(len(c.out_block_indexes))},
        'projector': {
            'conv1': conv('backbone.0.projector.conv1'),
            'norm1': ln('backbone.0.projector.norm1'),
            'downs': {
                'd{}'.format(k):
                conv('backbone.0.projector.downs.{}'.format(k))
                for k in range(c.num_levels - 1)},
            'down_norms': {
                'n{}'.format(k):
                ln('backbone.0.projector.down_norms.{}'.format(k))
                for k in range(c.num_levels - 1)},
        },
        'level_embed': sd['transformer.level_embed']
        .astype(np.float32),
        'enc_output': lin('transformer.enc_output'),
        'enc_output_norm': ln('transformer.enc_output_norm'),
        'enc_out_class_embed': lin('transformer.enc_out_class_embed'),
        'enc_out_bbox_embed': mlp3('transformer.enc_out_bbox_embed'),
        'ref_point_head': {
            'l0': lin('transformer.ref_point_head.layers.0'),
            'l1': lin('transformer.ref_point_head.layers.1'),
        },
        'decoder': {'d{}'.format(k): layer
                    for k, layer in enumerate(dec_layers)},
        'decoder_norm': ln('transformer.decoder.norm'),
        'class_embed': lin('class_embed'),
        'bbox_embed': mlp3('bbox_embed'),
    }
    return params


def convert_rfdetr_checkpoint(checkpoint_path, output_path=None,
                              arch='rfdetr_base', num_classes=None,
                              image_size=None, class_names=None,
                              verbose=False):
    """
    Offline conversion of an RF-DETR .pth checkpoint to the TPU-native
    .npz format. Reads the state dict via the stub unpickler (torch
    never runs in the serving path), maps it with
    convert_rfdetr_state_dict, and writes checkpoint + metadata.
    """

    state, extras = extract_torch_state_dict(checkpoint_path)
    # rfdetr checkpoints store under 'model' (handled by the extractor)
    # and carry a model_config block with resolution / class names
    model_config = extras.get('model_config', {}) or {}
    if num_classes is None:
        num_classes = int(model_config.get('num_classes', 0)) or None
    if num_classes is None:
        num_classes = state['class_embed.bias'].shape[0]
    if image_size is None:
        image_size = int(model_config.get('resolution', 560))
    if class_names is None:
        class_names = extras.get(
            'class_names',
            model_config.get('class_names',
                             model_config.get('names')))

    from megadetector_tpu.models.rfdetr import RFDetrConfig
    config = RFDetrConfig(arch, num_classes=num_classes,
                          image_size=image_size)
    params = convert_rfdetr_state_dict(state, config)

    if output_path is None:
        output_path = os.path.splitext(checkpoint_path)[0] + '.npz'
    metadata = {
        'metadata_format_version': 1.0,
        'arch': arch,
        'model_type': 'rfdetr',
        'num_classes': int(num_classes),
        'image_size': int(image_size),
        'class_names': list(class_names) if class_names else None,
    }
    save_checkpoint(params, output_path, metadata)
    if verbose:
        print('Converted {} -> {}'.format(checkpoint_path,
                                          output_path))
    return output_path


def convert_megadetector_checkpoint(checkpoint_path, output_path=None,
                                    arch=None, num_classes=None,
                                    model_version=None, image_size=1280,
                                    verbose=False):
    """
    End-to-end conversion of a reference MegaDetector .pt checkpoint to a
    TPU-native .npz + metadata.json. Returns the output path.
    """

    from megadetector_tpu.models import registry

    state_dict, extras = extract_torch_state_dict(
        checkpoint_path, verbose=verbose)

    # RF-DETR checkpoints (MDv1000-sorrel-rfdetr) route to their own
    # converter, so the one CLI works for every detector family
    # (reference loader: megadetector/detection/rfdetr_detector.py:34-141)
    if 'class_embed.bias' in state_dict or any(
            k.startswith('transformer.decoder') for k in state_dict):
        return convert_rfdetr_checkpoint(
            checkpoint_path, output_path,
            arch=arch if (arch or '').startswith('rfdetr')
            else 'rfdetr_base',
            num_classes=num_classes, verbose=verbose)

    if model_version is None:
        model_version = registry.get_detector_version_from_model_file(
            checkpoint_path) or 'unknown'
    if arch is None:
        entry = registry.known_models.get(model_version, {})
        arch = entry.get('arch', 'yolov5l6')
        image_size = entry.get('image_size', image_size)

    # Detect the ultralytics (anchor-free v8-style) layout from its
    # characteristic decoupled-head keys
    is_ultralytics = any('.dfl.' in k or ('.cv3.' in k and '.2.weight' in k)
                         for k in state_dict)

    if num_classes is None:
        names = extras.get('names')
        if names is not None:
            num_classes = len(names)
        elif is_ultralytics:
            cls_keys = sorted(k for k in state_dict
                              if '.cv3.0.2.weight' in k)
            assert cls_keys, 'Cannot infer class count'
            num_classes = state_dict[cls_keys[0]].shape[0]
        else:
            # Infer from a detect-head conv: out_channels = na*(5+nc).
            # Only plain '...m.<level>.weight' keys are detect heads —
            # backbone C3 blocks also contain '.m.' ('.m.0.cv1...'),
            # so require the key to END at the level index
            import re
            head_keys = [k for k in state_dict
                         if re.search(r'\.m\.\d+\.weight$', k)]
            assert len(head_keys) > 0, 'Cannot infer class count'
            out_ch = state_dict[sorted(head_keys)[0]].shape[0]
            num_classes = out_ch // 3 - 5

    anchors = None
    if is_ultralytics:
        from megadetector_tpu.models.yolov8 import (
            YoloV8Config, convert_ultralytics_state_dict)
        if arch is None or not arch.startswith('yolov8'):
            # Infer the variant from the stem width
            stem_key = [k for k in state_dict
                        if k.endswith('0.conv.weight')][0]
            stem_ch = state_dict[stem_key].shape[0]
            arch = {16: 'yolov8n', 32: 'yolov8s', 48: 'yolov8m',
                    64: 'yolov8l', 80: 'yolov8x'}.get(stem_ch, 'yolov8l')
        config = YoloV8Config(arch, num_classes=num_classes)
        params = convert_ultralytics_state_dict(state_dict, config)
        model_type = 'ultralytics'
    else:
        config = YoloV5Config(arch, num_classes=num_classes)
        params, anchors = convert_yolov5_state_dict(state_dict, config)
        if anchors is not None:
            config.anchors = anchors
        model_type = 'yolov5'

    names = extras.get('names',
                       ['animal', 'person', 'vehicle'][:num_classes])
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names, key=lambda x: int(x))]

    metadata = {
        'metadata_format_version': 1.0,
        'model_version_string': model_version,
        'arch': arch,
        'model_type': model_type,
        'num_classes': int(num_classes),
        'class_names': list(names),
        'image_size': int(image_size),
        'strides': [int(s) for s in config.strides],
    }
    if anchors is not None or hasattr(config, 'anchors'):
        if getattr(config, 'anchors', None) is not None:
            metadata['anchors'] = np.asarray(config.anchors).tolist()

    if output_path is None:
        output_path = os.path.join(
            os.path.dirname(os.path.abspath(checkpoint_path)),
            'md_{}.npz'.format(model_version))

    save_checkpoint(params, output_path, metadata)
    if verbose:
        print('Converted {} -> {}'.format(checkpoint_path, output_path))
    return output_path


def quantize_checkpoint(input_path, output_path,
                        calibration_folder=None,
                        calibration_image_size=None,
                        n_calibration_images=8, verbose=False,
                        mode='chain'):
    """
    Produce an int8 checkpoint from a converted float checkpoint.

    mode='chain' (default): int8-in/int8-out conv chains with calibrated
    static x/y scales — activations stay int8 in HBM between layers,
    convs run the 2x int8 MXU path. mode='static': the older per-conv
    static input scales with float activations between layers.

    Calibration images come from [calibration_folder] (recommended: a
    representative sample of real camera-trap images); without a folder,
    synthetic noise is used (scales will be rough). Validate detection
    deltas against goldens before production use.
    """

    import jax
    import numpy as _np
    from megadetector_tpu.models import yolov5 as _yolov5
    from megadetector_tpu.ops.folding import fold_early_params
    from megadetector_tpu.ops.quantization import (
        calibrate_activation_scales, calibrate_chain_scales,
        default_float_store, quantize_params, quantize_params_chain)

    params, metadata = load_checkpoint(input_path)
    metadata = metadata or {}
    arch = metadata.get('arch', 'yolov5l6')
    if not arch.startswith('yolov5'):
        raise ValueError(
            'int8-chain quantization currently supports the yolov5 '
            'family only (checkpoint arch: {}); run this model in '
            'bf16 instead'.format(arch))
    config = _yolov5.YoloV5Config(
        arch, num_classes=int(metadata.get('num_classes', 3)),
        anchors=metadata.get('anchors'))

    # Calibrate at the SERVING resolution by default: static activation
    # scales baked at a smaller canvas can clip at the real one
    if calibration_image_size is None:
        calibration_image_size = int(metadata.get('image_size', 640))

    if mode == 'chain':
        # Fold the early layers BEFORE chain quantization: the folded
        # l1/l2 present >=128 lanes, where int8 wins (the production
        # bench path); unfolded they would have to stay float. The
        # detector's own fold step is idempotent on folded checkpoints.
        params = fold_early_params(params, config)
        detect_name = 'l{}'.format(len(config.layers) - 1)
        q = quantize_params_chain(
            params, skip_names=(detect_name,),
            float_store_names=default_float_store(params))
    else:
        q = quantize_params(params)

    s = calibration_image_size
    if calibration_folder is not None:
        import cv2
        from megadetector_tpu.utils.path_utils import find_images
        from megadetector_tpu.ops.boxes import letterbox
        files = find_images(calibration_folder,
                            recursive=True)[:n_calibration_images]
        assert files, 'No calibration images in {}'.format(
            calibration_folder)
        imgs = []
        for fn in files:
            img = cv2.cvtColor(cv2.imread(fn), cv2.COLOR_BGR2RGB)
            canvas, _, _ = letterbox(img, (s, s), auto=False,
                                     scaleup=True)
            imgs.append(canvas.astype(_np.float32) / 255.0)
        samples = _np.stack(imgs)
    else:
        if verbose:
            print('Warning: calibrating on synthetic noise; provide '
                  'calibration images for production use')
        samples = _np.random.RandomState(0).uniform(
            0, 1, (4, s, s, 3)).astype(_np.float32)

    if mode == 'chain':
        calibrate_chain_scales(_yolov5.apply, config, q, samples)
    else:
        calibrate_activation_scales(_yolov5.apply, config, q, samples)

    metadata = dict(metadata)
    metadata['quantized'] = True
    metadata['quantization'] = 'int8-' + mode
    save_checkpoint(q, output_path, metadata)
    if verbose:
        print('Quantized {} -> {}'.format(input_path, output_path))
    return output_path


def main():
    """CLI: python -m megadetector_tpu.models.convert_weights ckpt.pt out.npz"""

    import argparse
    parser = argparse.ArgumentParser(
        description='Convert a torch MegaDetector checkpoint to a '
                    'TPU-native .npz')
    parser.add_argument('checkpoint', help='input .pt file')
    parser.add_argument('output', nargs='?', default=None,
                        help='output .npz path')
    parser.add_argument('--arch', default=None)
    parser.add_argument('--num_classes', type=int, default=None)
    parser.add_argument('--model_version', default=None)
    parser.add_argument('--verbose', action='store_true')
    parser.add_argument('--quantize', action='store_true',
                        help='also write an int8 static-scale checkpoint '
                             '(<output>.int8.npz)')
    parser.add_argument('--calibration_folder', default=None)
    args = parser.parse_args()
    out = convert_megadetector_checkpoint(
        args.checkpoint, args.output, arch=args.arch,
        num_classes=args.num_classes, model_version=args.model_version,
        verbose=args.verbose)
    print(out)
    if args.quantize:
        q_out = os.path.splitext(out)[0] + '.int8.npz'
        quantize_checkpoint(out, q_out,
                            calibration_folder=args.calibration_folder,
                            verbose=args.verbose)
        print(q_out)


if __name__ == '__main__':
    main()
