"""
On-device, fixed-shape non-maximum suppression.

TPU-native replacement for the reference's NMS path
(megadetector/detection/pytorch_detector.py:502-610, which filters by
objectness, scores detections as objectness * class confidence, takes the
best class per anchor, and runs per-class IoU suppression via
torchvision.ops.nms with max_det=300).

Design for XLA: everything is static-shape. Raw predictions [B, A, 5+C] are
reduced to a fixed top-K candidate set per image with lax.top_k; per-class
suppression uses the classic coordinate-offset trick (shift each class's
boxes to a disjoint region of the plane so one class-agnostic pass is
per-class exact); greedy suppression runs as a fixpoint iteration over the
precomputed KxK IoU matrix (one batched masked matvec per round, converging
in suppression-chain depth — single digits in practice — instead of K
sequential steps; hardware-measured ~2 ms/step faster at b64 than the
lax.fori_loop scan, which remains available as suppress_mode='loop').
Outputs are padded to [B, max_det] with a validity mask that flows to the
host JSON writer.
"""

import functools

import jax
import jax.numpy as jnp

# Class-offset floor: the actual offset is max(this, per-image max
# coordinate + 1), so per-class boxes can never overlap across classes
# at ANY canvas size (users can pass arbitrary --image_size).
_CLASS_OFFSET = 8192.0


def _pairwise_iou_xyxy(boxes):
    """IoU matrix [K, K] for xyxy boxes [K, 4]."""

    x0 = boxes[:, 0]
    y0 = boxes[:, 1]
    x1 = boxes[:, 2]
    y1 = boxes[:, 3]

    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)

    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])

    inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_suppress(iou, valid, iou_thres):
    """
    Greedy NMS keep-mask over score-sorted candidates.

    Args:
        iou: [K, K] IoU matrix (row/col order = descending score)
        valid: [K] bool, candidates that passed thresholds
        iou_thres: suppression threshold

    Returns:
        [K] bool keep mask
    """

    k = iou.shape[0]
    idx = jnp.arange(k)
    overlap = iou > iou_thres

    def body(i, keep):
        # If candidate i is still alive, suppress all lower-scored
        # candidates that overlap it beyond the threshold.
        row_active = keep[i]
        suppress = overlap[i] & (idx > i) & row_active
        return keep & jnp.logical_not(suppress)

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def _fixpoint_suppress(iou, valid, iou_thres):
    """
    Greedy-NMS keep mask via fixpoint iteration instead of a sequential
    scan.

    Let over[i, j] = (iou > thres) for i < j (i is higher-scored). The
    greedy keep mask g is the unique fixpoint of
        F(keep)[j] = valid[j] and not any_i(over[i, j] and keep[i]):
    triangularity makes the fixpoint unique (g[0] is forced, g[j] is
    determined by g[<j]), and iterating F from keep_0 = valid pins one
    more prefix index per step at worst, so it terminates in at most K
    steps — in practice in the suppression-chain depth (single digits).
    Each step is one batched [K, K] x [K] masked matvec on the VPU/MXU
    instead of K dependent micro-steps, which is why this wins on TPU.

    Same contract as _greedy_suppress.
    """

    k = iou.shape[0]
    idx = jnp.arange(k)
    # Strictly upper-triangular overlap (row i suppresses col j > i),
    # as f32 so the per-step reduction is a matvec
    over = ((iou > iou_thres) & (idx[:, None] < idx[None, :]))
    over = over.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        # Index j is pinned to its greedy value after j+1 iterations, so
        # k+2 bounds the loop even though convergence detection is the
        # expected exit
        return jnp.logical_and(jnp.any(keep != prev), it < k + 2)

    def body(state):
        keep, _, it = state
        suppressed = jnp.einsum('i,ij->j', keep, over,
                                preferred_element_type=jnp.float32)
        new = valid_f * (suppressed < 0.5)
        return new, keep, it + 1

    first = valid_f * (jnp.einsum(
        'i,ij->j', valid_f, over,
        preferred_element_type=jnp.float32) < 0.5)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (first, valid_f, jnp.int32(1)))
    return keep > 0.5


def nms_on_candidates(cands, iou_thres, max_det=300, class_agnostic=False,
                      use_pallas=False, suppress_mode='fixpoint'):
    """
    Suppression + compaction over an already-selected candidate set (the
    output of ops/decode.select_topk_candidates, or batched_nms's own
    selection): per-class greedy NMS via the coordinate-offset trick,
    then top-k compaction to [B, max_det].

    Args:
        cands: dict with 'boxes_cxcywh' [B, K, 4] f32 canvas pixels,
            'scores' [B, K] f32 descending, 'classes' [B, K] int32,
            'valid' [B, K] bool
        iou_thres / max_det / class_agnostic / use_pallas: as batched_nms

    Returns:
        same contract as batched_nms: dict of 'boxes' (xyxy), 'scores',
        'classes', 'valid', all [B, max_det(, .)].
    """

    def one_image(boxes_cxcywh, scores, classes, valid_k):
        cx, cy, w, h = (boxes_cxcywh[:, 0], boxes_cxcywh[:, 1],
                        boxes_cxcywh[:, 2], boxes_cxcywh[:, 3])
        boxes = jnp.stack(
            [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=1)

        if class_agnostic:
            offset_boxes = boxes
        else:
            # Offset derived from the data so canvases beyond 8192 px
            # still separate cleanly (invalid rows may hold garbage
            # coords; they are masked out of suppression by `valid`)
            offset = jnp.maximum(
                jnp.float32(_CLASS_OFFSET),
                jnp.max(jnp.where(valid_k[:, None], boxes, 0.0)) + 1.0)
            shift = classes.astype(boxes.dtype)[:, None] * offset
            offset_boxes = boxes + shift

        if use_pallas:
            from megadetector_tpu.ops.pallas_nms import pallas_greedy_nms
            keep = pallas_greedy_nms(offset_boxes[None], valid_k[None],
                                     iou_thres)[0]
        elif suppress_mode == 'fixpoint':
            iou = _pairwise_iou_xyxy(offset_boxes)
            keep = _fixpoint_suppress(iou, valid_k, iou_thres)
        else:
            iou = _pairwise_iou_xyxy(offset_boxes)
            keep = _greedy_suppress(iou, valid_k, iou_thres)

        kept_scores = jnp.where(keep, scores, -1.0)
        n_out = min(max_det, kept_scores.shape[0])
        final_scores, order = jax.lax.top_k(kept_scores, n_out)
        final_valid = final_scores > 0.0
        return {
            'boxes': boxes[order],
            'scores': jnp.where(final_valid, final_scores, 0.0),
            'classes': classes[order],
            'valid': final_valid,
        }

    out = jax.vmap(one_image)(cands['boxes_cxcywh'], cands['scores'],
                              cands['classes'], cands['valid'])
    if 'n_candidates' in cands:
        # Above-floor candidate count from the selection stage, so the
        # host can flag fixed-shape top-k truncation (count >
        # pre_nms_topk means the reference's uncapped nms() would have
        # kept more)
        out['n_candidates'] = cands['n_candidates']
    return out


@functools.partial(
    jax.jit, static_argnames=('max_det', 'pre_nms_topk', 'class_agnostic',
                              'use_pallas', 'suppress_mode'))
def batched_nms(pred, conf_thres, iou_thres, max_det=300,
                pre_nms_topk=1024, class_agnostic=False,
                use_pallas=False, suppress_mode='fixpoint'):
    """
    Full detection post-processing: candidate selection + per-class NMS.

    Args:
        pred: [B, A, 5+C] raw decoded predictions
            (x_center, y_center, w, h in canvas pixels; objectness;
            per-class confidences)
        conf_thres: confidence floor (applied to objectness AND to the
            final objectness*class score, matching the reference)
        iou_thres: NMS IoU threshold
        max_det: detections kept per image
        pre_nms_topk: candidate set size entering NMS
        class_agnostic: suppress across classes when True

    Returns:
        dict of arrays, all [B, max_det(, .)]:
            'boxes'  [B, max_det, 4] xyxy in canvas pixels
            'scores' [B, max_det]
            'classes'[B, max_det] int32 (0-based model classes)
            'valid'  [B, max_det] bool
    """

    num_classes = pred.shape[-1] - 5

    def select_one(p):
        obj = p[:, 4]
        cls_conf = p[:, 5:] * p[:, 4:5]
        best_score = jnp.max(cls_conf, axis=-1)
        best_class = jnp.argmax(cls_conf, axis=-1).astype(jnp.int32)

        # Reference filter chain: objectness > thres, then score > thres
        valid = (obj > conf_thres) & (best_score > conf_thres)
        ranked = jnp.where(valid, best_score, -1.0)

        k = min(pre_nms_topk, p.shape[0])
        top_scores, top_idx = jax.lax.top_k(ranked, k)
        return {
            'boxes_cxcywh': p[top_idx, :4],
            'scores': top_scores,
            'classes': best_class[top_idx],
            'valid': top_scores > 0.0,
            'n_candidates': jnp.sum(valid.astype(jnp.int32)),
        }

    cands = jax.vmap(select_one)(pred)
    return nms_on_candidates(
        cands, iou_thres, max_det=max_det,
        class_agnostic=(class_agnostic or num_classes == 1),
        use_pallas=use_pallas, suppress_mode=suppress_mode)


def nms_xyxy(boxes, scores, iou_thres, max_det=300):
    """
    Plain class-agnostic NMS over explicit boxes (used by tiled inference's
    cross-tile dedup; reference: detection/run_tiled_inference.py:276-338).

    Args:
        boxes: [N, 4] xyxy
        scores: [N]
        iou_thres: suppression threshold
        max_det: maximum survivors

    Returns:
        (keep_indices [max_det], valid [max_det]) — indices into the input,
        sorted by descending score.
    """

    n = boxes.shape[0]
    ranked = jnp.where(scores > 0, scores, -1.0)
    top_scores, order = jax.lax.top_k(ranked, n)
    iou = _pairwise_iou_xyxy(boxes[order])
    keep = _greedy_suppress(iou, top_scores > 0, iou_thres)
    kept_scores = jnp.where(keep, top_scores, -1.0)
    final_scores, sub_order = jax.lax.top_k(kept_scores, min(max_det, n))
    return order[sub_order], final_scores > 0
