"""
Pallas TPU kernel for greedy NMS suppression.

The greedy pass is the one sequential op in the detection pipeline: XLA
expresses it as a fori_loop of dynamic-slices over an HBM-resident IoU
matrix, paying a kernel-launch-like overhead per iteration. This kernel
keeps the candidate boxes and the keep-mask resident in VMEM for the
whole scan: per iteration it reads one box column, computes its IoU
against all candidates on the VPU (boxes are laid out [8, K] so the
candidate axis rides the 128-wide lanes), and clears the suppressed
lanes — no HBM traffic inside the loop.

Grid: one program per image; boxes arrive score-sorted from lax.top_k.
Runs under interpret mode on CPU for testing.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, thresh_ref, keep_ref):
    """
    boxes_ref: [8, K] f32 VMEM — rows 0..3 are x0, y0, x1, y1 of the
        score-sorted candidates (rows 4..7 padding for sublane alignment)
    valid_ref: [1, K] f32 VMEM — 1.0 for real candidates
    thresh_ref: [1, 1] f32 SMEM — IoU threshold
    keep_ref: [1, K] f32 VMEM output — 1.0 for survivors
    """

    k = boxes_ref.shape[1]
    thresh = thresh_ref[0, 0]

    x0 = boxes_ref[0:1, :]
    y0 = boxes_ref[1:2, :]
    x1 = boxes_ref[2:3, :]
    y1 = boxes_ref[3:4, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)

    # Mosaic requires integer iota; dynamic lane indexing is unsupported,
    # so box i's scalars are extracted with one-hot mask reductions
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    keep_ref[:, :] = valid_ref[:, :]

    def body(i, _):
        onehot = (col_idx == i).astype(jnp.float32)  # [1, K]
        xi0 = jnp.sum(x0 * onehot)
        yi0 = jnp.sum(y0 * onehot)
        xi1 = jnp.sum(x1 * onehot)
        yi1 = jnp.sum(y1 * onehot)
        area_i = jnp.maximum(xi1 - xi0, 0.0) * jnp.maximum(yi1 - yi0, 0.0)

        ix0 = jnp.maximum(x0, xi0)
        iy0 = jnp.maximum(y0, yi0)
        ix1 = jnp.minimum(x1, xi1)
        iy1 = jnp.minimum(y1, yi1)
        inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
        union = area + area_i - inter
        iou = inter / jnp.maximum(union, 1e-9)

        alive_i = jnp.sum(keep_ref[:, :] * onehot)
        # Suppress lower-ranked overlapping candidates when i is alive
        suppress = (iou > thresh).astype(jnp.float32) * \
            (col_idx > i).astype(jnp.float32) * alive_i
        keep_ref[:, :] = keep_ref[:, :] * (1.0 - suppress)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def pallas_greedy_nms(boxes_sorted, valid, iou_thres, interpret=False):
    """
    Greedy NMS keep-mask via the Pallas kernel.

    Args:
        boxes_sorted: [B, K, 4] xyxy, sorted by descending score
        valid: [B, K] bool
        iou_thres: scalar threshold
        interpret: run in interpreter mode (CPU testing)

    Returns:
        [B, K] bool keep mask
    """

    b, k, _ = boxes_sorted.shape
    # Lay boxes out [B, 8, K]: coordinate axis on sublanes, candidates on
    # lanes
    boxes_t = jnp.transpose(boxes_sorted, (0, 2, 1)).astype(jnp.float32)
    boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 4), (0, 0)))
    valid_f = valid.astype(jnp.float32)[:, None, :]
    thresh = jnp.full((1, 1), iou_thres, jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(boxes_ref, valid_ref, thresh_ref, keep_ref):
        _nms_kernel(boxes_ref.at[0], valid_ref.at[0], thresh_ref,
                    keep_ref.at[0])

    keep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(boxes_t, valid_f, thresh)

    return keep[:, 0, :] > 0.5
