"""
Detector fine-tuning: YOLOv5-style loss and a jitted, data-parallel train
step for the flagship model.

The reference defers detector training to the external YOLO repo
(megadetector/detection/README.md:3); this module brings it in-framework
so MDv5-style models fine-tune on TPU: anchor-ratio target assignment
with neighbor-cell expansion, CIoU box loss, BCE objectness with
per-level balancing, and BCE classification — all static-shape (targets
pad to a fixed per-image maximum) so one XLA program serves every step.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from megadetector_tpu.models import yolov5

# YOLOv5 hyperparameters (published defaults)
ANCHOR_MATCH_THRESHOLD = 4.0
BOX_GAIN = 0.05
OBJ_GAIN = 1.0
CLS_GAIN = 0.5
# Per-level objectness balance, P3..P6
OBJ_BALANCE = {3: (4.0, 1.0, 0.4), 4: (4.0, 1.0, 0.25, 0.06)}

# Neighbor-cell offsets: center, left, up, right, down
_OFFSETS = np.array([[0, 0], [-1, 0], [0, -1], [1, 0], [0, 1]],
                    np.float32)


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _ciou(box1, box2, eps=1e-7):
    """
    Complete IoU between center-format boxes [..., 4] (grid units).
    """

    b1x0 = box1[..., 0] - box1[..., 2] / 2
    b1y0 = box1[..., 1] - box1[..., 3] / 2
    b1x1 = box1[..., 0] + box1[..., 2] / 2
    b1y1 = box1[..., 1] + box1[..., 3] / 2
    b2x0 = box2[..., 0] - box2[..., 2] / 2
    b2y0 = box2[..., 1] - box2[..., 3] / 2
    b2x1 = box2[..., 0] + box2[..., 2] / 2
    b2y1 = box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1x1, b2x1) -
                     jnp.maximum(b1x0, b2x0), 0) * \
        jnp.clip(jnp.minimum(b1y1, b2y1) - jnp.maximum(b1y0, b2y0), 0)
    w1, h1 = box1[..., 2], box1[..., 3]
    w2, h2 = box2[..., 2], box2[..., 3]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    # Enclosing box diagonal and center distance
    cw = jnp.maximum(b1x1, b2x1) - jnp.minimum(b1x0, b2x0)
    ch = jnp.maximum(b1y1, b2y1) - jnp.minimum(b1y0, b2y0)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (box2[..., 0] - box1[..., 0]) ** 2 + \
        (box2[..., 1] - box1[..., 1]) ** 2

    v = (4 / (np.pi ** 2)) * \
        (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + 1 + eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - v * alpha


def detection_loss(config, params, images, gt_boxes, gt_classes, gt_mask,
                   compute_dtype=jnp.float32):
    """
    YOLOv5 loss.

    Args:
        config: YoloV5Config
        params: parameter pytree
        images: [B, S, S, 3] float in [0, 1]
        gt_boxes: [B, M, 4] cxcywh, normalized to the canvas
        gt_classes: [B, M] int32 (0-based model classes)
        gt_mask: [B, M] bool (valid targets)

    Returns:
        (total_loss, metrics dict)
    """

    b, s = images.shape[0], images.shape[1]
    m = gt_boxes.shape[1]
    nl = len(config.strides)
    na = config.num_anchors
    nc = config.num_classes
    balance = OBJ_BALANCE[nl]

    head_raw = yolov5.apply(config, params, images,
                            dtype=compute_dtype, decode=False)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    total_pos = 0.0

    for i_level, raw in enumerate(head_raw):
        stride = float(config.strides[i_level])
        gh, gw = raw.shape[1], raw.shape[2]
        raw = raw.reshape(b, gh, gw, na, 5 + nc).astype(jnp.float32)

        anchors = jnp.asarray(config.anchors[i_level],
                              jnp.float32) / stride  # grid units [na, 2]

        # GT in this level's grid units
        gxy = gt_boxes[..., 0:2] * s / stride          # [B, M, 2]
        gwh = gt_boxes[..., 2:4] * s / stride          # [B, M, 2]

        # Anchor-ratio matching: [B, M, na]
        r = gwh[:, :, None, :] / (anchors[None, None] + 1e-9)
        ratio = jnp.maximum(r, 1.0 / (r + 1e-9)).max(axis=-1)
        anchor_ok = ratio < ANCHOR_MATCH_THRESHOLD

        # Neighbor-offset validity: [B, M, 5]
        fx = gxy[..., 0] % 1.0
        fy = gxy[..., 1] % 1.0
        off_ok = jnp.stack([
            jnp.ones_like(fx, bool),
            (fx < 0.5) & (gxy[..., 0] > 1.0),
            (fy < 0.5) & (gxy[..., 1] > 1.0),
            (fx > 0.5) & (gxy[..., 0] < gw - 1.0),
            (fy > 0.5) & (gxy[..., 1] < gh - 1.0),
        ], axis=-1)

        # Candidate set: [B, M, na, 5]
        valid = gt_mask[:, :, None, None] & anchor_ok[:, :, :, None] & \
            off_ok[:, :, None, :]

        offsets = jnp.asarray(_OFFSETS)                 # [5, 2]
        cell = jnp.floor(gxy[:, :, None, None, :] -
                         offsets[None, None, None] * 0.5)
        # cell is [B, M, 1, 5, 2]; broadcast to the full candidate shape
        gi = jnp.broadcast_to(
            jnp.clip(cell[..., 0], 0, gw - 1), valid.shape
        ).astype(jnp.int32)
        gj = jnp.broadcast_to(
            jnp.clip(cell[..., 1], 0, gh - 1), valid.shape
        ).astype(jnp.int32)

        # Flatten candidates
        b_idx = jnp.broadcast_to(
            jnp.arange(b)[:, None, None, None], valid.shape)
        a_idx = jnp.broadcast_to(
            jnp.arange(na)[None, None, :, None], valid.shape)
        flat = lambda x: x.reshape(-1) # noqa
        vb, va = flat(b_idx), flat(a_idx)
        vj, vi = flat(gj), flat(gi)
        vmask = flat(valid).astype(jnp.float32)

        # Targets per candidate
        t_xy = jnp.broadcast_to(gxy[:, :, None, None, :],
                                valid.shape + (2,)).reshape(-1, 2)
        t_wh = jnp.broadcast_to(gwh[:, :, None, None, :],
                                valid.shape + (2,)).reshape(-1, 2)
        t_cls = jnp.broadcast_to(gt_classes[:, :, None, None],
                                 valid.shape).reshape(-1)
        cand_anchor = anchors[va]

        # Gather predictions at candidate cells
        p = raw[vb, vj, vi, va]                         # [N, 5+nc]
        p_sig = jax.nn.sigmoid(p)
        pxy = p_sig[:, 0:2] * 2.0 - 0.5 + \
            jnp.stack([vi, vj], axis=-1).astype(jnp.float32)
        pwh = jnp.square(p_sig[:, 2:4] * 2.0) * cand_anchor
        pred_box = jnp.concatenate([pxy, pwh], axis=-1)
        target_box = jnp.concatenate([t_xy, t_wh], axis=-1)

        ciou = _ciou(pred_box, target_box)
        n_pos = jnp.maximum(vmask.sum(), 1.0)
        lbox += jnp.sum((1.0 - ciou) * vmask) / n_pos

        # Objectness targets: scatter detached CIoU at positive cells
        tobj = jnp.zeros((b, gh, gw, na), jnp.float32)
        obj_val = jnp.clip(jax.lax.stop_gradient(ciou), 0.0) * vmask
        tobj = tobj.at[vb, vj, vi, va].max(obj_val)
        lobj += balance[i_level] * jnp.mean(
            _bce_with_logits(raw[..., 4], tobj))

        # Classification BCE at positives
        if nc > 1:
            one_hot = jax.nn.one_hot(t_cls, nc)
            cls_bce = _bce_with_logits(p[:, 5:], one_hot).mean(axis=-1)
            lcls += jnp.sum(cls_bce * vmask) / n_pos

        total_pos += vmask.sum()

    loss = (BOX_GAIN * lbox + OBJ_GAIN * lobj +
            CLS_GAIN * (nc / 80.0) * lcls) * b
    metrics = {'loss': loss, 'box_loss': lbox, 'obj_loss': lobj,
               'cls_loss': lcls, 'n_positives': total_pos}
    return loss, metrics


def make_detector_train_step(config, optimizer,
                             compute_dtype=jnp.float32):
    """
    (params, opt_state, images_u8 [B,S,S,3], gt_boxes, gt_classes,
    gt_mask) -> (params, opt_state, metrics). Jit (optionally with batch
    sharding over a mesh) and step.
    """

    def train_step(params, opt_state, images_u8, gt_boxes, gt_classes,
                   gt_mask):
        def loss_fn(p):
            x = images_u8.astype(jnp.float32) / 255.0
            return detection_loss(config, p, x, gt_boxes, gt_classes,
                                  gt_mask, compute_dtype)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_sharded_detector_train_step(config, optimizer, mesh,
                                     batch_axis='data',
                                     compute_dtype=jnp.float32):
    """Jit the detector train step with batch sharding over [mesh]."""

    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_detector_train_step(config, optimizer, compute_dtype)
    data = NamedSharding(mesh, P(batch_axis))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, data, data, data, data),
        out_shardings=(replicated, replicated, replicated))


def pad_targets(boxes_list, classes_list, max_targets=32):
    """
    Pad per-image target lists to fixed [B, M, ...] arrays.

    Args:
        boxes_list: list (len B) of [n_i, 4] cxcywh-normalized arrays
        classes_list: list of [n_i] int arrays
    Returns:
        (gt_boxes [B, M, 4] f32, gt_classes [B, M] i32, gt_mask [B, M])
    """

    b = len(boxes_list)
    gt_boxes = np.zeros((b, max_targets, 4), np.float32)
    # Padded slots keep a tiny nonzero box so CIoU math stays finite
    gt_boxes[..., 2:] = 1e-3
    gt_classes = np.zeros((b, max_targets), np.int32)
    gt_mask = np.zeros((b, max_targets), bool)
    for i, (boxes, classes) in enumerate(zip(boxes_list, classes_list)):
        n = min(len(boxes), max_targets)
        if n > 0:
            gt_boxes[i, :n] = np.asarray(boxes, np.float32)[:n]
            gt_classes[i, :n] = np.asarray(classes, np.int32)[:n]
            gt_mask[i, :n] = True
    return gt_boxes, gt_classes, gt_mask
