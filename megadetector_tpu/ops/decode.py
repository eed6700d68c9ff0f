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
2. per-level lax.top_k over that score (k_level = min(k, level size)),
   which together with a final merge top_k is exactly equivalent to a
   global top_k over the concatenated levels;
3. gather the K winning raw rows and decode ONLY those in f32 — grid
   cell position is recovered arithmetically from the flat candidate
   index (layout: ((gy*W + gx)*na + a)), so the [H, W] iota grids are
   never built.

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


def select_topk_candidates(head_outputs, anchors, strides, num_classes,
                           conf_thres, k, approx=True):
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

    Returns:
        dict with f32 'boxes_cxcywh' [B, K, 4] (canvas pixels),
        'scores' [B, K], 'classes' [B, K] int32, 'valid' [B, K] bool,
        all score-sorted descending.
    """

    no = 5 + num_classes
    per_level = []
    n_above = None

    for lvl, raw in enumerate(head_outputs):
        b, h, w, _ = raw.shape
        na = int(anchors[lvl].shape[0])
        n = h * w * na
        x = raw.reshape(b, n, no)

        # Ranking score from obj/cls logits only, f32 compute fused by
        # XLA. sigmoid is monotone, so max/argmax run on the RAW class
        # logits and only the winning logit gets sigmoided — bitwise
        # identical to sigmoiding all classes first (ties in the
        # logits are ties in the sigmoids, same first-index argmax),
        # at half the per-anchor transcendental work.
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
        cls_logits = x[..., 5:]
        best_cls = jax.nn.sigmoid(
            jnp.max(cls_logits, axis=-1).astype(jnp.float32))
        best_class = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        score = obj * best_cls
        valid = (obj > conf_thres) & (score > conf_thres)
        # Above-floor candidate count: lets the host detect when the
        # fixed top-k truncated the tail (the reference nms() has no
        # cap, pytorch_detector.py:502-610, so > pre_nms_topk candidates
        # means detections the reference would keep were dropped)
        lvl_count = jnp.sum(valid.astype(jnp.int32), axis=-1)
        n_above = lvl_count if n_above is None else n_above + lvl_count
        ranked = jnp.where(valid, score, -1.0)

        k_l = min(k, n)
        if approx and k_l < n:
            top_scores, top_idx = _verified_approx_topk(
                ranked, k_l, lvl_count)
        else:
            top_scores, top_idx = jax.lax.top_k(ranked, k_l)

        # Gather only the winners' raw rows ([B, k_l, no])
        rows = jnp.take_along_axis(x, top_idx[..., None], axis=1)
        rows = jax.nn.sigmoid(rows[..., :4].astype(jnp.float32))

        # Grid position from the flat index: idx = (gy*W + gx)*na + a
        a_idx = top_idx % na
        cell = top_idx // na
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)

        stride = jnp.float32(strides[lvl])
        cx = (rows[..., 0] * 2.0 - 0.5 + gx) * stride
        cy = (rows[..., 1] * 2.0 - 0.5 + gy) * stride
        anchor = jnp.asarray(anchors[lvl], jnp.float32)  # [na, 2]
        aw = anchor[a_idx, 0]
        ah = anchor[a_idx, 1]
        bw = jnp.square(rows[..., 2] * 2.0) * aw
        bh = jnp.square(rows[..., 3] * 2.0) * ah

        per_level.append({
            'boxes_cxcywh': jnp.stack([cx, cy, bw, bh], axis=-1),
            'scores': top_scores,
            'classes': jnp.take_along_axis(best_class, top_idx, axis=1),
        })

    out = merge_candidates(per_level, k)
    out['n_candidates'] = n_above
    return out


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
