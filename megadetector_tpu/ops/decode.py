"""
Fused anchor decode + candidate selection.

The straightforward pipeline (models/yolov5.py apply(decode=True) ->
ops/nms.batched_nms) materializes the full decoded prediction tensor
[B, A, 5+C] in f32 (A ~= 102k at 1280px) and then immediately reduces it
to ~512 candidates per image. That intermediate is pure HBM traffic: at
batch 64 it is ~200 MB per materialization point, several times per step.

This module selects candidates straight from the raw detect-head outputs
(reference semantics: megadetector/detection/pytorch_detector.py:502-610 —
objectness filter, score = objectness * best class confidence):

1. per pyramid level, compute the ranking score from the obj/cls logits
   only (channels 4: of each anchor block), never touching the box
   channels;
2. ONE global lax.top_k over the level-concatenated score map (the
   concat preserves flat-index order, so results — including exact-tie
   resolution — are identical to a per-level top_k + merge, at a
   quarter of the gather work; hardware split in
   experiments/exp_select_split.py);
3. gather the K winning raw rows and decode ONLY those in f32 — grid
   cell position is recovered arithmetically from the flat candidate
   index (layout: level offset + ((gy*W + gx)*na + a)), so the [H, W]
   iota grids are never built; the class argmax also runs only on the
   winners' rows.

The output feeds ops/nms.nms_on_candidates, skipping batched_nms's own
selection stage. Numerics match the unfused path: scores are
sigmoid-composed in f32 from the same bf16 logits, and the box decode is
the same YOLOv5-v6 form ((2s-0.5+g)*stride, (2s)^2*anchor).
"""

import jax
import jax.numpy as jnp

# Test-injectable handle (tests substitute a deliberately lossy
# implementation to exercise the exact-fallback branch below).
_approx_max_k = jax.lax.approx_max_k


def _verified_approx_topk(ranked, k, n_above):
    """lax.top_k semantics at approx_max_k speed, verified at runtime.

    `ranked` is the per-level score map where every above-floor
    candidate is positive and every below-floor slot is exactly -1.0
    (see select_topk_candidates). Only the above-floor candidates ever
    matter downstream: below-floor slots keep score <= 0 through the
    merge and are masked by `valid = final_scores > 0` before NMS, so
    their (arbitrary) identities never reach emission.

    The fast path runs jax.lax.approx_max_k (TPU PartialReduce — about
    half the cost of the exact per-level lax.top_k at the production
    shape, experiments/exp_topk_approx.py) and then PROVES the result
    equivalent: it counts the positive entries the approx set captured
    and compares against `n_above`, the exact above-floor count already
    computed from the full map. captured == n_above implies every
    above-floor candidate is in the approx set (captured can never
    exceed n_above because positive ranked values occur only at valid
    slots). The captured set is then re-sorted by (score desc, index
    asc) — lax.top_k's documented tie rule — so the output is
    elementwise identical to exact lax.top_k in every slot that can
    influence results. If any candidate was missed (or n_above > k,
    where approx could silently swap tail candidates), a lax.cond falls
    back to the exact lax.top_k, so results are identical by
    construction in ALL cases, not just at the approx recall target.
    """

    a_scores, a_idx = _approx_max_k(ranked, k)
    captured = jnp.sum((a_scores > 0.0).astype(jnp.int32), axis=-1)
    ok = jnp.all(captured == n_above)

    def use_approx(operands):
        s, i = operands
        neg = -s
        neg_sorted, idx_sorted = jax.lax.sort((neg, i), num_keys=2)
        return (-neg_sorted, idx_sorted)

    def use_exact(_):
        s, i = jax.lax.top_k(ranked, k)
        return (s, i)

    return jax.lax.cond(ok, use_approx, use_exact, (a_scores, a_idx))


def _select_level_cm(raw, anchors_l, stride, num_classes, conf_thres,
                     k, approx):
    """Per-level candidate selection in the channel-major layout.

    The row-major path reshapes the head tensor to [B, N, 5+nc] and runs
    every full-map elementwise op (sigmoid, class max/argmax, threshold,
    count, mask) on an (5+nc)-wide minor dimension — 8 of 128 vector
    lanes at nc=3. This variant transposes once to [B, na, 5+nc, H*W]
    so the same ops run with grid cells on the full lane axis, then
    gathers only the K winners' box logits back (a lane-axis gather of
    k cells x 4 channels). Candidate SET and scores are identical to
    the row-major path; only the flat index layout differs
    (a*H*W + cell here vs (cell*na + a) there), which can reorder
    exact score ties in the downstream merge.
    """

    no = 5 + num_classes
    b, h, w, _ = raw.shape
    na = int(anchors_l.shape[0])
    hw = h * w
    n = hw * na

    xt = raw.reshape(b, hw, na, no).transpose(0, 2, 3, 1)  # [B,na,no,HW]
    obj = jax.nn.sigmoid(xt[:, :, 4, :].astype(jnp.float32))
    cls_logits = xt[:, :, 5:, :]
    best_cls = jax.nn.sigmoid(
        jnp.max(cls_logits, axis=2).astype(jnp.float32))
    # argmax in sigmoid space for the reference's saturated-logit tie
    # rule (see the global path below); full-map VPU work is measured
    # free in this layout (exp_select_cm_profile)
    best_class = jnp.argmax(
        jax.nn.sigmoid(cls_logits.astype(jnp.float32)),
        axis=2).astype(jnp.int32)
    score = obj * best_cls                                  # [B, na, HW]
    valid = (obj > conf_thres) & (score > conf_thres)
    lvl_count = jnp.sum(valid.astype(jnp.int32), axis=(1, 2))
    ranked = jnp.where(valid, score, -1.0).reshape(b, n)

    k_l = min(k, n)
    if approx and k_l < n:
        top_scores, top_idx = _verified_approx_topk(ranked, k_l,
                                                    lvl_count)
    else:
        top_scores, top_idx = jax.lax.top_k(ranked, k_l)

    a_idx = top_idx // hw
    cell = top_idx % hw
    gx = (cell % w).astype(jnp.float32)
    gy = (cell // w).astype(jnp.float32)

    # Winners' box logits: gather the k cells for all na*4 box channels
    # in one lane-axis gather, then pick each candidate's anchor block
    box_src = xt[:, :, :4, :].reshape(b, na * 4, hw)
    g1 = jnp.take_along_axis(box_src, cell[:, None, :], axis=2)
    rows_all = g1.reshape(b, na, 4, k_l)
    rows = jnp.take_along_axis(
        rows_all, a_idx[:, None, None, :], axis=1)[:, 0]    # [B, 4, k]
    rows = jax.nn.sigmoid(rows.transpose(0, 2, 1).astype(jnp.float32))

    stride = jnp.float32(stride)
    cx = (rows[..., 0] * 2.0 - 0.5 + gx) * stride
    cy = (rows[..., 1] * 2.0 - 0.5 + gy) * stride
    anchor = jnp.asarray(anchors_l, jnp.float32)            # [na, 2]
    aw = anchor[a_idx, 0]
    ah = anchor[a_idx, 1]
    bw = jnp.square(rows[..., 2] * 2.0) * aw
    bh = jnp.square(rows[..., 3] * 2.0) * ah

    classes = jnp.take_along_axis(
        best_class.reshape(b, n), top_idx, axis=1)
    return {
        'boxes_cxcywh': jnp.stack([cx, cy, bw, bh], axis=-1),
        'scores': top_scores,
        'classes': classes,
    }, lvl_count


def select_topk_candidates(head_outputs, anchors, strides, num_classes,
                           conf_thres, k, approx=True,
                           channel_major=False):
    """
    Args:
        head_outputs: list of raw per-level head tensors
            [B, H_l, W_l, na*(5+nc)] (any float dtype; typically bf16)
        anchors: [levels, na, 2] anchor sizes in pixels
        strides: per-level stride tuple
        num_classes: nc
        conf_thres: confidence floor (objectness AND obj*cls, as in the
            reference filter chain)
        k: candidate count to keep across all levels
        approx: select per-level candidates through the runtime-verified
            approx_max_k fast path (results identical by construction —
            see _verified_approx_topk; False forces plain lax.top_k)
        channel_major: run the full-map score work in the transposed
            [B, na, 5+nc, H*W] layout (full vector lanes; see
            _select_level_cm). Same candidate set/scores; exact score
            TIES between candidates may merge in a different order.

    Returns:
        dict with f32 'boxes_cxcywh' [B, K, 4] (canvas pixels),
        'scores' [B, K], 'classes' [B, K] int32, 'valid' [B, K] bool,
        all score-sorted descending.
    """

    no = 5 + num_classes
    n_above = None

    if channel_major:
        per_level = []
        for lvl, raw in enumerate(head_outputs):
            cands, lvl_count = _select_level_cm(
                raw, anchors[lvl], strides[lvl], num_classes,
                conf_thres, k, approx)
            per_level.append(cands)
            n_above = lvl_count if n_above is None else n_above + lvl_count
        out = merge_candidates(per_level, k)
        out['n_candidates'] = n_above
        return out

    # Global single-top_k formulation. The hardware split
    # (experiments/exp_select_split.py) showed per-winner gathers and
    # the per-level merge dominate the selection segment: the original
    # per-level form gathered/decoded levels*K candidates and re-top_k'd
    # the merged K*levels pool. Here the ranked maps concatenate (in
    # level order, so the flat index order — and therefore top_k's
    # documented tie rule — is IDENTICAL to the per-level+merge form),
    # one top_k selects the global winners, and exactly K rows are
    # gathered and decoded. The class argmax is also deferred to the
    # winners' gathered rows instead of running full-map.
    b = head_outputs[0].shape[0]
    na = int(anchors[0].shape[0])
    xs, ranked_list, level_meta = [], [], []
    offset = 0
    for lvl, raw in enumerate(head_outputs):
        _, h, w, _ = raw.shape
        assert int(anchors[lvl].shape[0]) == na
        n = h * w * na
        x = raw.reshape(b, n, no)

        # Ranking score from obj/cls logits only, f32 compute fused by
        # XLA. sigmoid is monotone, so the class max runs on the RAW
        # logits and only the winning logit gets sigmoided — bitwise
        # identical to sigmoiding all classes first, at half the
        # per-anchor transcendental work.
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
        best_cls = jax.nn.sigmoid(
            jnp.max(x[..., 5:], axis=-1).astype(jnp.float32))
        score = obj * best_cls
        valid = (obj > conf_thres) & (score > conf_thres)
        # Above-floor candidate count: lets the host detect when the
        # fixed top-k truncated the tail (the reference nms() has no
        # cap, pytorch_detector.py:502-610, so > pre_nms_topk candidates
        # means detections the reference would keep were dropped)
        lvl_count = jnp.sum(valid.astype(jnp.int32), axis=-1)
        n_above = lvl_count if n_above is None else n_above + lvl_count
        ranked_list.append(jnp.where(valid, score, -1.0))
        xs.append(x)
        level_meta.append((offset, w))
        offset += n

    n_total = offset
    ranked = jnp.concatenate(ranked_list, axis=1)
    x_all = jnp.concatenate(xs, axis=1)

    k_g = min(k, n_total)
    if approx and k_g < n_total:
        top_scores, top_idx = _verified_approx_topk(ranked, k_g, n_above)
    else:
        top_scores, top_idx = jax.lax.top_k(ranked, k_g)

    # One gather of the K winners' raw rows ([B, K, no]). The class
    # argmax runs on the SIGMOIDED f32 winner rows, not the raw logits:
    # sigmoid is monotone so the max VALUE is identical either way, but
    # when two class logits both exceed ~16.6 their f32 sigmoids round
    # to exactly 1.0 and the reference's sigmoid-space argmax
    # (pytorch_detector.py:502-610) tie-breaks to the LOWER class index
    # — raw-logit argmax would pick the genuinely larger logit and
    # report a different class on saturated detections. Only K rows get
    # the extra transcendentals, so the full-map saving stands.
    rows = jnp.take_along_axis(x_all, top_idx[..., None], axis=1)
    classes = jnp.argmax(
        jax.nn.sigmoid(rows[..., 5:].astype(jnp.float32)),
        axis=-1).astype(jnp.int32)
    boxp = jax.nn.sigmoid(rows[..., :4].astype(jnp.float32))

    # Level recovery from the global flat index (static boundaries),
    # then per-level grid decode: local = (gy*W + gx)*na + a
    n_levels = len(head_outputs)
    level = jnp.zeros_like(top_idx)
    for lvl in range(1, n_levels):
        level = level + (top_idx >= level_meta[lvl][0]).astype(
            top_idx.dtype)
    offsets = jnp.asarray([m[0] for m in level_meta], top_idx.dtype)
    ws = jnp.asarray([m[1] for m in level_meta], top_idx.dtype)
    strides_arr = jnp.asarray(strides, jnp.float32)

    local = top_idx - offsets[level]
    a_idx = local % na
    cell = local // na
    w_l = ws[level]
    gx = (cell % w_l).astype(jnp.float32)
    gy = (cell // w_l).astype(jnp.float32)
    st = strides_arr[level]
    anc = jnp.asarray(anchors, jnp.float32)       # [levels, na, 2]
    aw = anc[level, a_idx, 0]
    ah = anc[level, a_idx, 1]

    cx = (boxp[..., 0] * 2.0 - 0.5 + gx) * st
    cy = (boxp[..., 1] * 2.0 - 0.5 + gy) * st
    bw = jnp.square(boxp[..., 2] * 2.0) * aw
    bh = jnp.square(boxp[..., 3] * 2.0) * ah

    return {
        'boxes_cxcywh': jnp.stack([cx, cy, bw, bh], axis=-1),
        'scores': top_scores,
        'classes': classes,
        'valid': top_scores > 0.0,
        'n_candidates': n_above,
    }


def merge_candidates(cands_list, k):
    """
    Merge candidate sets (each with 'boxes_cxcywh' [B, K_i, 4], 'scores'
    [B, K_i], 'classes' [B, K_i]) into one score-sorted top-k set. Used
    for the per-level merge above and for combining TTA passes at the
    candidate level (instead of concatenating full decode tensors).
    """

    boxes = jnp.concatenate([p['boxes_cxcywh'] for p in cands_list], axis=1)
    scores = jnp.concatenate([p['scores'] for p in cands_list], axis=1)
    classes = jnp.concatenate([p['classes'] for p in cands_list], axis=1)

    k_out = min(k, scores.shape[1])
    final_scores, order = jax.lax.top_k(scores, k_out)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    classes = jnp.take_along_axis(classes, order, axis=1)
    return {
        'boxes_cxcywh': boxes,
        'scores': final_scores,
        'classes': classes,
        'valid': final_scores > 0.0,
    }
