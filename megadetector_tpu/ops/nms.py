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
per-class exact); greedy suppression walks the score-sorted candidates with
a lax.fori_loop over a precomputed KxK IoU matrix. Outputs are padded to
[B, max_det] with a validity mask that flows to the host JSON writer.
"""

import functools

import jax
import jax.numpy as jnp

# Class offset must exceed any canvas coordinate so per-class boxes can
# never overlap across classes (canvas is <= 4096 px in practice).
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


@functools.partial(
    jax.jit, static_argnames=('max_det', 'pre_nms_topk', 'class_agnostic',
                              'use_pallas'))
def batched_nms(pred, conf_thres, iou_thres, max_det=300,
                pre_nms_topk=1024, class_agnostic=False,
                use_pallas=False):
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

    def one_image(p):
        obj = p[:, 4]
        cls_conf = p[:, 5:] * p[:, 4:5]
        best_score = jnp.max(cls_conf, axis=-1)
        best_class = jnp.argmax(cls_conf, axis=-1).astype(jnp.int32)

        # Reference filter chain: objectness > thres, then score > thres
        valid = (obj > conf_thres) & (best_score > conf_thres)
        ranked = jnp.where(valid, best_score, -1.0)

        k = min(pre_nms_topk, p.shape[0])
        top_scores, top_idx = jax.lax.top_k(ranked, k)
        boxes_cxcywh = p[top_idx, :4]
        classes = best_class[top_idx]
        scores = best_score[top_idx]
        valid_k = top_scores > 0.0

        # xywh (center) -> xyxy
        cx, cy, w, h = (boxes_cxcywh[:, 0], boxes_cxcywh[:, 1],
                        boxes_cxcywh[:, 2], boxes_cxcywh[:, 3])
        boxes = jnp.stack(
            [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=1)

        # Per-class NMS via disjoint coordinate offsets
        if class_agnostic or num_classes == 1:
            offset_boxes = boxes
        else:
            shift = classes.astype(boxes.dtype)[:, None] * _CLASS_OFFSET
            offset_boxes = boxes + shift

        if use_pallas:
            # VMEM-resident greedy scan (see ops/pallas_nms.py); vmap
            # lifts the [K] call to the batch
            from megadetector_tpu.ops.pallas_nms import pallas_greedy_nms
            keep = pallas_greedy_nms(offset_boxes[None], valid_k[None],
                                     iou_thres)[0]
        else:
            iou = _pairwise_iou_xyxy(offset_boxes)
            keep = _greedy_suppress(iou, valid_k, iou_thres)

        # Compact kept detections to the front, preserving score order
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

    return jax.vmap(one_image)(pred)


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
