"""
Test-only FULL-PIPELINE oracle: an independent numpy/torch/cv2
implementation of the reference's classic-mode single-image detection
path, used as the golden contract when real MDv5 weights are unavailable
(this environment has no egress).

Implements, from the reference's published semantics:
- YOLOv5 letterbox (pytorch_detector.py:406-455): min-ratio resize
  (INTER_LINEAR), stride-mod padding when auto=True, 114-gray borders
- classic preprocessing (pytorch_detector.py:1030-1068: letterbox
  auto=True scaleup=True directly to the target size)
- the custom NMS chain via tests.test_nms.reference_nms
  (pytorch_detector.py:502-610)
- scale_coords + clip (yolov5 semantics used at
  pytorch_detector.py:1379-1381), .round()
- reversed-prediction-order emission, xyxy2xywh/gn normalization,
  truncate_float COORD_DIGITS=4 / CONF_DIGITS=3, class+1 categories
  (pytorch_detector.py:1383-1410)
"""

import cv2
import numpy as np
import torch

from megadetector_tpu.utils import ct_utils

COORD_DIGITS = 4
CONF_DIGITS = 3


def reference_letterbox(img, new_shape, stride=32, auto=True,
                        scaleup=True):
    """YOLOv5 letterbox. Returns (canvas, ratio, (dw, dh))."""

    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    shape = img.shape[:2]  # (h, w)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2.0
    dh /= 2.0
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return img, ratio, (dw, dh)


def reference_scale_coords(img1_shape, coords, img0_shape):
    """
    Map xyxy coords from the letterboxed canvas (img1_shape, (h, w)) back
    to original-image pixels (img0_shape), then clip. YOLOv5
    scale_coords with ratio_pad=None (the classic-mode call).
    """

    coords = np.array(coords, dtype=np.float64)
    gain = min(img1_shape[0] / img0_shape[0],
               img1_shape[1] / img0_shape[1])
    pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
           (img1_shape[0] - img0_shape[0] * gain) / 2)
    coords[:, [0, 2]] -= pad[0]
    coords[:, [1, 3]] -= pad[1]
    coords /= gain
    coords[:, [0, 2]] = coords[:, [0, 2]].clip(0, img0_shape[1])
    coords[:, [1, 3]] = coords[:, [1, 3]].clip(0, img0_shape[0])
    return coords


def reference_scale_img(x, ratio, gs):
    """
    yolov5's scale_img: bilinear-interpolate a CHW float tensor batch
    to (int(h*ratio), int(w*ratio)), then pad bottom/right up to the
    next [gs] multiple with gray 0.447 (the reference TTA's per-pass
    input transform).
    """

    import math
    import torch.nn.functional as F

    if ratio == 1.0:
        return x
    h, w = x.shape[2:]
    sh, sw = int(h * ratio), int(w * ratio)
    x = F.interpolate(x, size=(sh, sw), mode='bilinear',
                      align_corners=False)
    ph = math.ceil(sh / gs) * gs
    pw = math.ceil(sw / gs) * gs
    return F.pad(x, (0, pw - sw, 0, ph - sh), value=0.447)


def reference_forward_augment(model, x, gs, nl=None):
    """
    yolov5's Model.forward_augment (the behavior behind the
    reference's augment=True, pytorch_detector.py:1313): passes
    (scale, flip-dim) = (1, None), (0.83, 3), (0.67, None); each pass
    optionally hflips, scale_imgs, forwards, then de-scales by the
    nominal scale and de-flips against the original canvas width
    (_descale_pred); finally the augmented tails clip
    (_clip_augmented, exclude-layer count 1): the coarsest detect
    level's rows drop from the unscaled pass and the finest level's
    rows from the most-scaled pass. [nl] = number of detect levels
    (introspected from a TorchYolo mirror; single-level stand-ins pass
    or infer 1, which disables clipping). Returns the concatenated
    predictions.
    """

    if nl is None:
        detect = getattr(model, 'model', [None])[-1] \
            if hasattr(model, 'model') else None
        nl = int(getattr(detect, 'nl', 1))

    img_w = x.shape[3]
    ys = []
    for s, flip_dim in ((1.0, None), (0.83, 3), (0.67, None)):
        xi = reference_scale_img(
            x.flip(flip_dim) if flip_dim is not None else x, s, gs)
        with torch.no_grad():
            yi = model(xi)
        yi[..., :4] /= s
        if flip_dim == 3:
            yi[..., 0] = img_w - yi[..., 0]
        ys.append(yi)

    if nl > 1:
        g = sum(4 ** k for k in range(nl))
        a0 = ys[0].shape[1]
        ys[0] = ys[0][:, : a0 - a0 // g]
        a2 = ys[-1].shape[1]
        ys[-1] = ys[-1][:, (a2 // g) * (4 ** (nl - 1)):]
    return torch.cat(ys, 1)


def reference_detect_one_image(model, img_original, image_size,
                               stride=32, detection_threshold=0.005,
                               letterbox_auto=True, augment=False):
    """
    The reference classic-mode pipeline on one RGB HWC uint8 image.
    [letterbox_auto]=True is the reference's behavior (minimal
    stride-multiple rectangle); False letterboxes to the full square
    canvas (the TPU framework's static-shape choice) so the two canvas
    policies can be compared. [augment] runs the reference's TTA
    recipe (reference_forward_augment).

    Returns a list of MD-format detection dicts.
    """

    from test_nms import reference_nms

    canvas, _, _ = reference_letterbox(
        img_original, image_size, stride=stride, auto=letterbox_auto,
        scaleup=True)

    x = torch.tensor(
        canvas.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
    if augment:
        pred = reference_forward_augment(model, x, gs=stride).numpy()
    else:
        with torch.no_grad():
            pred = model(x).numpy()

    det_list = reference_nms(pred, conf_thres=detection_threshold,
                             iou_thres=0.45, max_det=300)
    det = np.asarray(det_list[0], dtype=np.float64)

    detections = []
    if det.shape[0] > 0:
        det[:, :4] = reference_scale_coords(
            canvas.shape[:2], det[:, :4], img_original.shape).round()
        gn = np.array([img_original.shape[1], img_original.shape[0],
                       img_original.shape[1], img_original.shape[0]],
                      dtype=np.float64)
        for row in det[::-1]:
            conf = float(row[4])
            if conf < detection_threshold:
                continue
            x1, y1, x2, y2 = row[:4]
            xywh = np.array([(x1 + x2) / 2, (y1 + y2) / 2,
                             x2 - x1, y2 - y1]) / gn
            api_box = ct_utils.convert_yolo_to_xywh(list(xywh))
            api_box = ct_utils.truncate_float_array(
                api_box, precision=COORD_DIGITS)
            conf = ct_utils.truncate_float(conf, precision=CONF_DIGITS)
            detections.append({
                'category': str(int(row[5]) + 1),
                'conf': conf,
                'bbox': api_box,
            })
    return detections


def spread_detect_head(model, scale=6.0, obj_bias=-5.0, seed=0):
    """
    Make a random-weight mirror model behave like a TRAINED detector:
    strongly negative objectness bias so detections are sparse (only
    strong local activations fire), amplified conv weights so the peaks
    that do fire are well-separated in score. Without this, random
    weights fire on half the anchors with exactly-tied scores on smooth
    image regions, and NMS tie-breaking order (not correctness) decides
    the survivor set.
    """

    rng = np.random.RandomState(seed)
    detect = model.model[-1]
    nc = detect.nc
    no = detect.no
    for conv in detect.m:
        conv.weight.data.mul_(scale)
        bias = np.zeros(conv.bias.shape[0], dtype=np.float32)
        for a in range(conv.bias.shape[0] // no):
            base = a * no
            bias[base:base + 4] = rng.uniform(-0.5, 0.5, 4)
            bias[base + 4] = obj_bias + rng.uniform(-0.5, 0.5)
            bias[base + 5:base + 5 + nc] = rng.uniform(-1.5, 1.5, nc)
        conv.bias.data.copy_(torch.tensor(bias))
    return model
