"""
Width-folding for the early high-resolution layers of YOLOv5-family nets.

Problem (hardware-measured, see experiments/exp_early_convs.py): tensors
with <128 channels waste TPU vector lanes — at b64/1280px the first four
layers (3, 64 and 128-channel feature maps) run at 4-42 TFLOP/s while the
mid-network runs at ~130-147, costing ~86 ms of a 232 ms forward while
holding ~7% of the FLOPs.

Fix: pack adjacent width-pixel pairs into channels ("folded" layout
[B, H, W/2, 2C], channel c' = phase*C + c with phase = column parity) so
every early tensor presents >=128 lanes, and rewrite each conv as a
structured conv on the folded layout whose kernel taps reproduce the
original receptive field EXACTLY (same multiply-accumulate terms; only
lane placement changes). Measured wins: l1 2.4x, 3x3@64ch 1.6x,
1x1@64ch 2.4x (experiments/exp_folded_convs.py).

Scope: layers l0..l3 form a pure chain in every YOLOv5 config (no skip
connection reaches below l4), so folding is fully contained:

    l0  6x6s2 3->C0 p2  => input folded by 4 ([B,H,W/4,12] — a free view
        of the row-major host buffer), kernel [6,3] stride (2,1),
        12 -> 2*C0, output folded by 2
    l1  3x3s2 C0->C1    => kernel [3,3] stride (2,2), 2C0 -> 2C1, folded
    l2  C3(C1)          => cv1||cv2 merged into one folded 1x1; bottleneck
        1x1s as block-diagonal folded 1x1s; bottleneck 3x3s as [3,3]
        folded kernels; cv3 folded
    l3  3x3s2 C1->C2    => kernel [3,2] stride (2,1), consumes folded,
        emits the NORMAL layout — the network continues unchanged

The transform is a pure offline weight rewrite: folded nodes are ordinary
conv nodes ({'w','b'} or int8 {'w_q','w_scale','b',...}), so dtype casts,
device placement, and chain quantization all compose untouched. Folded
mode is detected from the l0 weight shape ([6,3,12,*]) by
models/yolov5.apply, which supplies the folded strides/paddings.

Reference for the layer the fold rewrites: the reference runs these
layers through torch convs (megadetector/detection/pytorch_detector.py:
1313); this module is pure TPU-side layout engineering with no reference
counterpart.
"""

import numpy as np


def _conv_keys(node):
    """Return (weight_key, is_quantized) for a conv param node."""

    if 'w' in node:
        return 'w', False
    if 'w_q' in node:
        return 'w_q', True
    raise ValueError('Not a conv node: {}'.format(list(node)))


def _np(a):
    return np.asarray(a)


def _like(node, updates):
    """Copy a conv node with [updates], preserving its type — quantized
    nodes are QConvParams (a registered pytree class that keeps
    x_scale/y_scale static); losing the class would turn the scales into
    traced leaves."""

    out = type(node)(node)
    out.update(updates)
    return out


def _fold_bias(node, copies=2):
    updates = {'b': np.concatenate([_np(node['b'])] * copies)}
    if 'w_scale' in node:
        updates['w_scale'] = np.concatenate(
            [_np(node['w_scale'])] * copies)
    return _like(node, updates)


def fold_l0(node):
    """[6,6,3,C] -> [6,3,12,2C]: input folded by 4, output folded by 2.

    Output col 2w'+p reads original cols 4w'+2p+kx-2 (kx in 0..5): with
    t = 2p+kx-2, that is folded-by-4 column w' + t//4, subphase t%4.
    """

    key, _ = _conv_keys(node)
    w = _np(node[key])
    c = w.shape[3]
    wf = np.zeros((6, 3, 12, 2 * c), w.dtype)
    for p in (0, 1):
        for kx in range(6):
            t = 2 * p + kx - 2
            wf[:, t // 4 + 1, 3 * (t % 4):3 * (t % 4) + 3,
               p * c:(p + 1) * c] += w[:, kx]
    out = _fold_bias(node)
    out[key] = wf
    return out


def fold_l0_h2(node):
    """fold_l0 + a height-fold by 2: [6,3,12,2C] -> [3,3,24,2C] s(1,1).

    Motivation (hardware profile, docs/perf-profile.md): under a naive
    per-tap lane-padding model the w4-folded l0 (18 taps at K=12) runs
    at ~9% MXU utilization; packing the input row parity into channels
    as well halves the tap count (3x3=9 at K=24) for the same true MAC
    set. MEASURED OUTCOMES (v5e): (r4, exp_h2_cm_e2e) 1.4% slower e2e
    with the relayout in-model; (r5, exp_stem_s2d) the conv ALONE wins
    17% on a pre-materialized folded input (9.76 vs 11.75 ms b64 bf16);
    (r5, exp_h2_emit_e2e) but even with the relayout absorbed into the
    device-letterbox epilogue (preprocess_device fold_layout='h2') the
    e2e is NEUTRAL (424.5 vs 422.0 img/s b128 int8, noise) — the
    isolated conv win does not survive the e2e fusion context. Kept as
    an opt-in design point (detector option folded_h2=true, which now
    uses the h2-emitting letterbox on the device path) to retry on
    toolchain updates.

    Derivation: true output row r reads true input rows 2r+ky-2
    (ky in 0..5). With h-folded input rows X[R] = (x[2R], x[2R+1]),
    input row 2r+ky-2 = 2*(r + ky//2 - 1) + (ky%2), i.e. folded row
    r + ty - 1 with ty = ky//2 and parity q = ky%2 — 3 unit-stride row
    taps. Input channel order is q*12 + g (h-parity major), matching
    the view built in models/yolov5._apply_folded_layer. The true
    2-row padding becomes exactly 1 folded zero row per side. Use with
    stride (1,1), padding ((1,1),(1,1)) on the [B, H/2, W/4, 24] view;
    the output layout is IDENTICAL to fold_l0's, so l1..l3 are
    untouched.
    """

    key, _ = _conv_keys(node)
    if tuple(_np(node[key]).shape[:3]) == (6, 6, 3):
        node = fold_l0(node)
    w = _np(node[key])
    assert tuple(w.shape[:3]) == (6, 3, 12), \
        'fold_l0_h2 needs a raw or w4-folded l0 kernel, got {}'.format(
            w.shape)
    co = w.shape[3]
    wf = np.zeros((3, 3, 24, co), w.dtype)
    for ky in range(6):
        q = ky % 2
        wf[ky // 2, :, q * 12:q * 12 + 12, :] = w[ky]
    return _like(node, {key: wf})


def fold_conv_s2(node):
    """[3,3,Ci,Co] s2 -> [3,3,2Ci,2Co] s(2,2) folded-in, folded-out.

    Output col 2w''+p reads original cols 4w''+2p+kx-1: with
    t = 2p+kx-1, folded column 2w'' + t//2 (stride 2), phase t%2.
    """

    key, _ = _conv_keys(node)
    w = _np(node[key])
    ci, co = w.shape[2], w.shape[3]
    wf = np.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for p in (0, 1):
        for kx in range(3):
            t = 2 * p + kx - 1
            wf[:, t // 2 + 1, (t % 2) * ci:(t % 2) * ci + ci,
               p * co:(p + 1) * co] += w[:, kx]
    out = _fold_bias(node)
    out[key] = wf
    return out


def fold_conv_s2_exit(node):
    """[3,3,Ci,Co] s2 -> [3,2,2Ci,Co] s(2,1): folded input, NORMAL output.

    Output col w reads original cols 2w+kx-1: kx=0 -> folded col w-1
    phase 1; kx=1 -> folded col w phase 0; kx=2 -> folded col w phase 1.
    Use with padding ((1,1),(1,0)).
    """

    key, _ = _conv_keys(node)
    w = _np(node[key])
    ci = w.shape[2]
    co = w.shape[3]
    wf = np.zeros((3, 2, 2 * ci, co), w.dtype)
    wf[:, 0, ci:2 * ci, :] += w[:, 0]
    wf[:, 1, 0:ci, :] += w[:, 1]
    wf[:, 1, ci:2 * ci, :] += w[:, 2]
    return _like(node, {key: wf})


def fold_1x1(node):
    """[1,1,C,Co] -> block-diagonal [1,1,2C,2Co] on the folded layout."""

    key, _ = _conv_keys(node)
    w = _np(node[key])
    ci, co = w.shape[2], w.shape[3]
    wf = np.zeros((1, 1, 2 * ci, 2 * co), w.dtype)
    for p in (0, 1):
        wf[0, 0, p * ci:(p + 1) * ci, p * co:(p + 1) * co] = w[0, 0]
    out = _fold_bias(node)
    out[key] = wf
    return out


def fold_3x3_s1(node):
    """[3,3,C,C] s1 -> [3,3,2C,2C] s1 on the folded layout.

    Output phase 0 (col 2w') taps cols 2w'-1 (folded w'-1 ph1), 2w'
    (w' ph0), 2w'+1 (w' ph1); phase 1 (col 2w'+1) taps 2w' (w' ph0),
    2w'+1 (w' ph1), 2w'+2 (w'+1 ph0).
    """

    key, _ = _conv_keys(node)
    w = _np(node[key])
    ci, co = w.shape[2], w.shape[3]
    wf = np.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    # output phase 0
    wf[:, 0, ci:2 * ci, 0:co] += w[:, 0]
    wf[:, 1, 0:ci, 0:co] += w[:, 1]
    wf[:, 1, ci:2 * ci, 0:co] += w[:, 2]
    # output phase 1
    wf[:, 1, 0:ci, co:2 * co] += w[:, 0]
    wf[:, 1, ci:2 * ci, co:2 * co] += w[:, 1]
    wf[:, 2, 0:ci, co:2 * co] += w[:, 2]
    out = _fold_bias(node)
    out[key] = wf
    return out


def fold_c3(c3_params, n):
    """
    Fold a C3 block: merge cv1 and cv2 into one folded 1x1 ('cv12', output
    channels [fold(y1) | fold(y2)]), fold every bottleneck, fold cv3
    (input layout [fold(y1) | fold(y2)], output folded).

    cv1/cv2 merging requires float nodes with matching geometry; the
    chain-quantization policy keeps l2 float (ops/quantization.py
    DEFAULT_FLOAT_STORE_LAYERS), so this always holds in practice.
    """

    cv1, cv2, cv3 = c3_params['cv1'], c3_params['cv2'], c3_params['cv3']
    for node in (cv1, cv2, cv3):
        if 'w' not in node:
            raise ValueError('fold_c3 requires float cv nodes')

    w1, w2 = _np(cv1['w']), _np(cv2['w'])
    ci = w1.shape[2]
    ch = w1.shape[3]
    # cv12: [1,1,2ci, 4ch]; output blocks [p0y1|p1y1|p0y2|p1y2]
    w12 = np.zeros((1, 1, 2 * ci, 4 * ch), w1.dtype)
    for p in (0, 1):
        w12[0, 0, p * ci:(p + 1) * ci, p * ch:(p + 1) * ch] = w1[0, 0]
        w12[0, 0, p * ci:(p + 1) * ci,
            2 * ch + p * ch:2 * ch + (p + 1) * ch] = w2[0, 0]
    b12 = np.concatenate([_np(cv1['b'])] * 2 + [_np(cv2['b'])] * 2)

    # cv3: original input [y1(ch) | y2(ch)], folded input
    # [p0y1|p1y1(2ch)] ++ [p0y2|p1y2(2ch)], folded output
    w3 = _np(cv3['w'])
    co = w3.shape[3]
    w3f = np.zeros((1, 1, 4 * ch, 2 * co), w3.dtype)
    for p in (0, 1):
        w3f[0, 0, p * ch:(p + 1) * ch, p * co:(p + 1) * co] = \
            w3[0, 0, 0:ch]
        w3f[0, 0, 2 * ch + p * ch:2 * ch + (p + 1) * ch,
            p * co:(p + 1) * co] = w3[0, 0, ch:2 * ch]
    b3 = np.concatenate([_np(cv3['b'])] * 2)

    out = {
        'cv12': {'w': w12, 'b': b12},
        'cv3': {'w': w3f, 'b': b3},
    }
    for j in range(n):
        m = c3_params['m{}'.format(j)]
        out['m{}'.format(j)] = {
            'cv1': fold_1x1(m['cv1']),
            'cv2': fold_3x3_s1(m['cv2']),
        }
    return out


def params_are_folded(params):
    """True when the l0 node carries a folded weight ([6,3,12,*] w4 or
    [3,3,24,*] h2+w4)."""

    node = params.get('l0')
    if not isinstance(node, dict):
        return False
    w = node.get('w', node.get('w_q'))
    return w is not None and tuple(w.shape[:3]) in ((6, 3, 12),
                                                    (3, 3, 24))


def foldable(config):
    """Whether the config's first four layers match the foldable prefix."""

    try:
        l0, l1, l2, l3 = config.layers[0:4]
    except ValueError:
        return False
    return (l0['kind'] == 'conv' and l0['k'] == 6 and l0['s'] == 2 and
            l0.get('p') == 2 and l0['c_in'] == 3 and
            l1['kind'] == 'conv' and l1['k'] == 3 and l1['s'] == 2 and
            l2['kind'] == 'c3' and
            l3['kind'] == 'conv' and l3['k'] == 3 and l3['s'] == 2 and
            min(config.save_indices, default=4) >= 4)


def fold_early_params(params, config, h2=False):
    """
    Return a copy of [params] with l0..l3 rewritten into folded form
    (shared references for everything else), or [params] unchanged when
    the architecture prefix doesn't match. Idempotent. h2 selects the
    h2+w4 l0 kernel (fold_l0_h2) — hardware-measured 1.4% slower e2e
    on the current toolchain (experiments/exp_h2_cm_e2e.py), so the
    default stays the w4-only form, which is also what the opt-in
    pallas_l0 / stem_gemm paths consume.
    """

    if params_are_folded(params) or not foldable(config):
        return params
    try:
        folded = {
            'l0': fold_l0_h2(params['l0']) if h2 else fold_l0(params['l0']),
            'l1': fold_conv_s2(params['l1']),
            'l2': fold_c3(params['l2'], config.layers[2]['n']),
            'l3': fold_conv_s2_exit(params['l3']),
        }
    except (ValueError, KeyError):
        return params
    out = dict(params)
    out.update(folded)
    return out
