"""
On-device letterbox preprocessing: batched resize + pad + normalize
inside the XLA program.

This replaces the host cv2 letterbox (the reference's per-image CPU
preprocessing, megadetector/detection/pytorch_detector.py:1030-1109 and
the BASELINE north-star "letterbox-resize + pad + normalize fuses into a
kernel feeding HBM batches"): the host only decodes JPEGs and memcpys
each image into a fixed uint8 staging canvas; the device computes, per
image, the letterbox geometry (identical to ops/boxes.letterbox with
auto=False, scaleup=True), a bilinear resize with cv2's half-pixel
convention, gray (114) padding, and the /255 normalization — all fused by
XLA into the convolution pipeline's input.

Boxes scale back with the same scale_coords math as the host path, since
the geometry (r = min(S/h, S/w), centered rounded padding) is identical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_half_away(x):
    """round() with ties away from zero (matches Python round for the
    positive values used here closely enough; cv2/letterbox use
    int(round(x)))."""

    return jnp.floor(x + 0.5)


def _interp_matrix(src_pos, src_size, src_extent):
    """
    One-hot bilinear interpolation matrix [out, src_size]: row i holds
    weight (1-f) at floor(src_pos[i]) and f at floor+1 (clamped to the
    valid extent). When floor and floor+1 clamp to the same column the
    weights sum back to 1.
    """

    y0 = jnp.floor(src_pos)
    frac = src_pos - y0
    y0 = y0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, src_extent - 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (src_pos.shape[0],
                                                src_size), 1)
    return (cols == y0[:, None]).astype(jnp.float32) * \
        (1 - frac)[:, None] + \
        (cols == y1[:, None]).astype(jnp.float32) * frac[:, None]


def _out_hw(out_size):
    if isinstance(out_size, (tuple, list)):
        return int(out_size[0]), int(out_size[1])
    return int(out_size), int(out_size)


def fold_canvas_h2(x):
    """
    The h2+w4 folded view of a canvas: [..., H, W, 3] ->
    [..., H/2, W/4, 24] with channel k = q*12 + p*3 + c for row parity
    q, column subphase p = w%4 (the layout ops/folding.fold_l0_h2's
    kernel consumes; matches models/yolov5._apply_folded_layer). Works
    on any dtype; pure relayout, bit-identical values.
    """

    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    assert c == 3 and h % 2 == 0 and w % 4 == 0, \
        'h2 fold needs RGB with H % 2 == 0 and W % 4 == 0'
    lead = x.shape[:-3]
    n = len(lead)
    x = x.reshape(lead + (h // 2, 2, w // 4, 12))
    x = x.transpose(tuple(range(n)) + (n, n + 2, n + 1, n + 3))
    return x.reshape(lead + (h // 2, w // 4, 24))


def letterbox_one(image_u8, height, width, out_size, pad_value=114.0,
                  use_matmul=True, scale_target=None, resize_dtype=None,
                  fold_layout=None):
    """
    Letterbox one image from a staging canvas onto [out_h, out_w].

    Two implementations with identical geometry (cv2 half-pixel
    bilinear, centered rounded padding):

    - use_matmul=True (default): separable resize as two structured
      matmuls on the MXU — a vertical interpolation matrix [s, S0] and a
      horizontal one [S0, s] built in-program from the per-image scale.
      This is the TPU-native formulation: image gathers are
      lane-hostile, but one-hot matmuls run at MXU rate.
    - use_matmul=False: the original elementwise 4-corner gather
      (kept as the numerics oracle).

    Args:
        image_u8: [S0h, S0w, 3] uint8 staging canvas; the valid image
            occupies the top-left [height, width] region
        height, width: traced int32 scalars, the valid region
        out_size: static output canvas — an int (square) or (h, w)
            tuple (aspect-bucketed rectangle)
        pad_value: gray fill
        scale_target: the square size the letterbox ratio is computed
            from (r = min(T/h, T/w)). Defaults to max(out_h, out_w).
            Passing the model's square inference size with a minimal
            stride-rectangle out canvas reproduces the reference's
            letterbox(auto=True) geometry exactly
            (pytorch_detector.py:1064-1068).
        resize_dtype: MXU operand dtype for the two interpolation
            matmuls (matmul path only; accumulation is always f32).
            None/f32 = exact f32 operands; bfloat16 runs the resize at
            native MXU rate (~5x the emulated-f32 matmul on v5e) at a
            bounded <=2/255 pixel drift — uint8 pixel values are exact
            in bf16, only the fractional interpolation weights round.
            Pass the model's compute dtype: a bf16 forward re-rounds
            the canvas to bf16 at its input cast anyway.
        fold_layout: None = planar [out_h, out_w, 3]; 'h2' = emit the
            h2+w4 folded stem layout [out_h/2, out_w/4, 24] directly
            (see fold_canvas_h2) so an h2-folded l0
            (ops/folding.fold_l0_h2) consumes the letterbox output with
            no standalone relayout between them — the permute sits
            inside the letterbox program's epilogue, before the masked
            pad/normalize write, instead of as a normalize-then-
            transpose pair at the model input (matmul path only;
            bit-identical values, VERDICT-r4 item 1).

    Returns:
        [out_h, out_w, 3] float32 in [0, 1] (or the folded layout)
    """

    if use_matmul:
        return _letterbox_one_matmul(image_u8, height, width, out_size,
                                     pad_value, scale_target,
                                     resize_dtype, fold_layout)
    assert fold_layout is None, \
        'fold_layout requires the matmul letterbox'
    return _letterbox_one_gather(image_u8, height, width, out_size,
                                 pad_value, scale_target)


def _letterbox_one_matmul(image_u8, height, width, out_size,
                          pad_value=114.0, scale_target=None,
                          resize_dtype=None, fold_layout=None):
    s_h, s_w = _out_hw(out_size)
    assert fold_layout in (None, 'h2'), fold_layout
    if fold_layout == 'h2':
        assert s_h % 2 == 0 and s_w % 4 == 0, \
            'h2 fold needs canvas H % 2 == 0 and W % 4 == 0'
    t = float(scale_target) if scale_target is not None \
        else float(max(s_h, s_w))
    s0h, s0w = image_u8.shape[0], image_u8.shape[1]
    h = height.astype(jnp.float32)
    w = width.astype(jnp.float32)

    r = jnp.minimum(t / h, t / w)
    # jnp.round = round-half-to-even, matching Python's int(round())
    # in letterbox/auto_target_shape — at an exact .5 tie a half-away
    # round would scale content one row past the minimal auto canvas
    new_w = jnp.round(w * r)
    new_h = jnp.round(h * r)
    # The -0.1 offset makes these tie-free; keep floor(x+0.5)
    left = _round_half_away((s_w - new_w) / 2.0 - 0.1)
    top = _round_half_away((s_h - new_h) / 2.0 - 0.1)

    oy = jnp.arange(s_h, dtype=jnp.float32)
    ox = jnp.arange(s_w, dtype=jnp.float32)
    sy = jnp.clip((oy - top + 0.5) * (h / new_h) - 0.5, 0.0, h - 1.0)
    sx = jnp.clip((ox - left + 0.5) * (w / new_w) - 0.5, 0.0, w - 1.0)

    # Interpolation matrices, with rows zeroed where the OUTPUT pixel
    # falls in the letterbox padding (those positions then read 0 and
    # get the pad fill added below)
    m_v = _interp_matrix(sy, s0h, height)                   # [s_h, S0h]
    m_h = _interp_matrix(sx, s0w, width)                    # [s_w, S0w]
    row_ok = (oy >= top) & (oy < top + new_h)
    col_ok = (ox >= left) & (ox < left + new_w)
    m_v = m_v * row_ok[:, None].astype(jnp.float32)
    m_h = m_h * col_ok[:, None].astype(jnp.float32)

    # Both matmuls accumulate in f32 regardless of operand dtype; with
    # bf16 operands the MXU runs at native rate (f32 matmul is emulated
    # ~5x slower on v5e) and uint8 pixel values stay exact — only the
    # interpolation weights round, bounding drift at ~2 u8 levels.
    rd = jnp.float32 if resize_dtype is None else resize_dtype
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    img = image_u8.astype(rd).reshape(s0h, s0w * 3)
    y = mm(m_v.astype(rd), img)                             # [s_h, S0w*3]
    y = y.reshape(s_h, s0w, 3).transpose(0, 2, 1)           # [s_h, 3, S0w]
    out = mm(y.astype(rd).reshape(s_h * 3, s0w),
             m_h.T.astype(rd)).reshape(s_h, 3, s_w)         # [s_h, 3, s_w]

    if fold_layout == 'h2':
        # [(i,q), c, (j',p)] -> [i, j', q, p, c]: ONE permute, placed
        # before the masked pad/normalize so the relayout rides the
        # epilogue write instead of a standalone transpose between the
        # normalize and the conv (channel k = q*12 + p*3 + c)
        o5 = out.reshape(s_h // 2, 2, 3, s_w // 4, 4)
        o5 = o5.transpose(0, 3, 1, 4, 2)
        mask5 = (row_ok.reshape(s_h // 2, 2)[:, None, :, None, None] &
                 col_ok.reshape(s_w // 4, 4)[None, :, None, :, None])
        o5 = o5 + (1.0 - mask5.astype(jnp.float32)) * pad_value
        return o5.reshape(s_h // 2, s_w // 4, 24) / 255.0

    out = out.transpose(0, 2, 1)                            # [s_h, s_w, 3]

    mask = (row_ok[:, None] & col_ok[None, :])[..., None]
    out = out + (1.0 - mask.astype(jnp.float32)) * pad_value
    return out / 255.0


def _letterbox_one_gather(image_u8, height, width, out_size,
                          pad_value=114.0, scale_target=None):
    s_h, s_w = _out_hw(out_size)
    t = float(scale_target) if scale_target is not None \
        else float(max(s_h, s_w))
    h = height.astype(jnp.float32)
    w = width.astype(jnp.float32)

    r = jnp.minimum(t / h, t / w)
    new_w = jnp.round(w * r)  # half-to-even, see the matmul variant
    new_h = jnp.round(h * r)
    # letterbox splits the pad as dw/2 with round(x -/+ 0.1): the left/top
    # side gets round(pad/2 - 0.1); the -0.1 offset makes these tie-free
    left = _round_half_away((s_w - new_w) / 2.0 - 0.1)
    top = _round_half_away((s_h - new_h) / 2.0 - 0.1)

    # Destination pixel grid
    iy = jax.lax.broadcasted_iota(jnp.float32, (s_h, s_w), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (s_h, s_w), 1)

    in_region = (iy >= top) & (iy < top + new_h) & \
                (ix >= left) & (ix < left + new_w)

    # cv2 half-pixel source mapping: src = (dst + 0.5) * (src_size /
    # dst_size) - 0.5
    sy = (iy - top + 0.5) * (h / new_h) - 0.5
    sx = (ix - left + 0.5) * (w / new_w) - 0.5
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)

    img = image_u8.astype(jnp.float32)

    def gather(yi, xi):
        return img[yi, xi]

    p00 = gather(y0, x0)
    p01 = gather(y0, x1)
    p10 = gather(y1, x0)
    p11 = gather(y1, x1)

    interp = (p00 * (1 - wy) * (1 - wx) + p01 * (1 - wy) * wx +
              p10 * wy * (1 - wx) + p11 * wy * wx)

    out = jnp.where(in_region[..., None], interp, pad_value)
    return out / 255.0


@functools.partial(jax.jit, static_argnames=('out_size', 'scale_target',
                                             'resize_dtype',
                                             'fold_layout'))
def letterbox_batch(images_u8, sizes, out_size, scale_target=None,
                    resize_dtype=None, fold_layout=None):
    """
    Batched on-device letterbox.

    Args:
        images_u8: [B, S0h, S0w, 3] uint8 staging canvases
        sizes: [B, 2] int32 (height, width) of each valid region
        out_size: static canvas — side int (e.g. 1280) or (h, w) tuple
        scale_target: see letterbox_one
        resize_dtype: see letterbox_one (None = exact f32 matmuls)
        fold_layout: see letterbox_one (None or 'h2')

    Returns:
        [B, out_h, out_w, 3] float32 in [0, 1] (folded when fold_layout)
    """

    return jax.vmap(
        lambda img, hw: letterbox_one(img, hw[0], hw[1], out_size,
                                      scale_target=scale_target,
                                      resize_dtype=resize_dtype,
                                      fold_layout=fold_layout)
    )(images_u8, sizes)


def stage_images(images, staging_size=None, multiple=128):
    """
    Host-side staging: copy variable-size HWC uint8 images into one padded
    uint8 batch canvas (memcpy only — no resize). The staging canvas is
    the per-dimension max rounded up to [multiple] — rectangular when the
    batch is all-landscape or all-portrait, which cuts host->HBM staging
    traffic by ~25% on typical 4:3 camera-trap batches. Images larger
    than the staging canvas are NOT handled here (pre-shrink on host
    first).

    Returns (staged [B, S0h, S0w, 3] uint8, sizes [B, 2] int32).
    """

    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    if staging_size is None:
        staging_h = ((max_h + multiple - 1) // multiple) * multiple
        staging_w = ((max_w + multiple - 1) // multiple) * multiple
    elif isinstance(staging_size, (tuple, list)):
        staging_h, staging_w = int(staging_size[0]), int(staging_size[1])
    else:
        staging_h = staging_w = int(staging_size)
    assert max_h <= staging_h and max_w <= staging_w, \
        'Image exceeds staging canvas'

    staged = np.zeros((len(images), staging_h, staging_w, 3),
                      dtype=np.uint8)
    sizes = np.zeros((len(images), 2), dtype=np.int32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        staged[i, :h, :w] = im
        sizes[i] = (h, w)
    return staged, sizes
