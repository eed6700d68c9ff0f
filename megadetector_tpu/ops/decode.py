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


def select_topk_candidates(head_outputs, anchors, strides, num_classes,
                           conf_thres, k):
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
