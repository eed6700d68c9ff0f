"""
Pallas kernel: fused u8 staging -> normalize -> folded-l0 conv -> SiLU.

The folded l0 (see ops/folding.py: [6,3,12,128] kernel, stride (2,1) on
the [B, H, W/4, 12] width-folded u8 view) is the one early layer XLA
cannot run near the roofline: the 12-channel input minor dimension wastes
~90% of the vector lanes on every load, and the conv runs at ~52 TFLOP/s
dense vs ~120 sustained elsewhere (hardware-measured,
experiments/exp_folded_breakdown.py). int8 MXU also regresses here
(experiments/exp_l0_int8_input.py).

STATUS (2026-08-17, hardware-bisected): correct in interpret mode, but
the axon remote-compile Mosaic stack cannot compile it — every scheme
for bridging the 12-byte pixel-group granularity to the 128-lane tiling
crashes or is rejected:
  - minor-dim splitting reshape ([2R, 4224] -> [2R, 352, 12]): compiler
    subprocess crash (HTTP 500) even in a cast+sum-only kernel;
  - concatenate of 18 x 12-wide pieces on the minor axis: 'tpu.concatenate'
    internal error at piece 16;
  - strided vector slices: 'expected strides to be confined to [1, 2)';
  - DMA from a sliced HBM ref (.at[pl.ds(...)], static or dynamic, any
    rank): compiler subprocess crash; only full-array DMAs compile;
  - blocked VMEM specs on [..., 352, 12]: rejected (last two block dims
    must divide the (32, 128) u8 tile).
Keep this kernel for newer Mosaic stacks; the production path stays on
the XLA folded conv (13.3 ms at b64 @1280, vs this kernel's ~6-8 ms
projected). See experiments/exp_pallas_l0.py and NEXT.md.
Retried 2026-08-17 (round 3): unchanged — full-array DMA compile still
crashes the remote compile helper (HTTP 500, subprocess exit 1).
Retried 2026-08-19 (round 4): the toolchain UPDATED — sliced HBM DMAs
now compile and give real diagnostics instead of crashing. Progress
ladder this session:
  - rank-4 [.., Wf+2, 12] DMA slice: "Slice shape along dimension 2
    must be aligned to tiling (8), but is 322" -> fixed by padding the
    folded-col extent to 8-aligned;
  - then "Slice shape along dimension 3 must be aligned to tiling
    (128), but is 12" -> the 12-lane minor dim can never satisfy it;
  - flat [B, Hp, Wfp*12] view (Wfp*12 % 128 == 0): the DMA COMPILES.
    The in-kernel lane-split back to [.., Wfp, 12] is the remaining
    blocker: vector reshape -> clean reject ("infer-vector-layout:
    unsupported shape cast"); ref.reshape view before the load ->
    compile-helper crash (HTTP 500).
The kernel is kept on the flat-DMA + ref-free vector-reshape form
(interpret-exact); one supported lane-splitting primitive (or a
rank-3 DMA with relaxed minor-dim alignment) is all that is missing.
Retried 2026-08-19 round 5 (experiments/exp_pallas_l0_retry.py):
unchanged — the in-VMEM 12-lane group split still crashes the remote
compile helper (HTTP 500, subprocess exit 1), and the minimal bf16 VPU
epilogue probe still fails Mosaic 'vector.broadcast' verification
(f32 -> vector<8x128xbf16> element-type mismatch). Both signatures
identical to round 4; no Mosaic update between rounds.

This kernel:
  1. DMAs raw u8 row bands straight from HBM (one band per grid step),
  2. builds the [R*320, 216] im2col patch matrix in VMEM (six stride-2
     row slices x three folded-column taps, concatenated on the minor
     axis — a VPU-local relayout of a few hundred KB),
  3. runs ONE K=216 matmul on the MXU per band with the /255
     normalization pre-folded into the weights,
  4. applies bias + SiLU and writes the [R, 320, 128] bf16 output block.

The host-side wrapper pads the image once ([B, H+4, W/4+2, 12] u8, the
2-row / 1-folded-col halo) so the kernel's DMA windows are unconditional.

No reference counterpart: this is TPU-side layout engineering for the
layer the reference runs as a plain torch conv
(megadetector/detection/pytorch_detector.py:1313).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _l0_kernel(w_ref, b_ref, x_hbm, out_ref, scratch, im2col_ref, sem, *,
               rows_per_band, wf):
    """One grid step: output rows [i*R, (i+1)*R) of one image.

    w_ref:   [216, 128] bf16 (im2col layout, /255 pre-folded) in VMEM
    b_ref:   [1, 128] f32 in VMEM
    x_hbm:   [Hp, Wf+2, 12] u8 for THIS image (blocked on batch), ANY/HBM
    out_ref: [R, Wf, 128] bf16 VMEM block (auto-pipelined)
    scratch: [2R+4, Wf+2, 12] u8 VMEM
    """

    r = rows_per_band
    bi = pl.program_id(0)
    i = pl.program_id(1)

    # Input band: padded rows [2*i*r, 2*i*r + 2r + 8) of image bi.
    # The HBM array is the FLAT row view [B, Hp, Wfp*12] with
    # Wfp*12 % 128 == 0: Mosaic requires slice extents aligned to the
    # (8, 128) tile on the last two dims, which the natural
    # [..., Wfp, 12] rank-4 view can never satisfy on its 12-lane
    # minor dim. The slice takes 2r+8 rows (8-aligned); rows beyond
    # 2r+4 are padding and never read by the taps.
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * (2 * r), 2 * r + 8)], scratch, sem)
    dma.start()
    dma.wait()

    # Split the flat rows back into folded columns, then widen (Mosaic
    # has no direct u8->bf16 cast). This vector-level lane split is the
    # remaining toolchain blocker (see STATUS): kept in the form that
    # produces a clean diagnostic ("unsupported shape cast") rather
    # than the ref.reshape view, which crashes the compile helper.
    wp = scratch.shape[1] // 12
    x = scratch[:].reshape(2 * r + 8, wp, 12)
    x = x.astype(jnp.int32).astype(jnp.bfloat16)
    # Output row rr reads padded input row 2*rr + ky. Mosaic has no
    # strided vector slices, so view the band as row pairs once: row
    # 2g+j lives at pair (g, j), and tap ky = 2a+b selects the
    # unit-stride pair range [a, a+r) at parity b. Pieces land in the
    # im2col scratch via 12-wide column stores (Mosaic's minor-dim
    # vector concat rejects this many narrow pieces).
    xpairs = x.reshape((2 * r + 8) // 2, 2, wp, 12)
    for ky in range(6):
        a, parity = divmod(ky, 2)
        rows = xpairs[a:a + r, parity]  # [r, Wf+2, 12]
        for kx in range(3):
            piece = jax.lax.slice(rows, (0, kx, 0), (r, kx + wf, 12))
            t = ky * 3 + kx
            im2col_ref[:, t * 12:(t + 1) * 12] = \
                piece.reshape(r * wf, 12)

    acc = jnp.dot(im2col_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32)
    y = acc + b_ref[0, :]
    y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.reshape(r, wf, w_ref.shape[1]).astype(out_ref.dtype)


def prepare_l0_weights(l0_params):
    """Rearrange the folded-l0 conv node into kernel form.

    Returns (w_im2col [216, C] bf16 with /255 folded in, bias [1, C] f32).
    Accepts float nodes only (l0 stays float in every quantization
    policy; ops/quantization.py DEFAULT_FLOAT_STORE_LAYERS_FOLDED).
    """

    w = np.asarray(l0_params['w'], np.float32)
    assert w.shape[:3] == (6, 3, 12), \
        'prepare_l0_weights needs the folded l0 kernel, got {}'.format(
            w.shape)
    c = w.shape[3]
    # [ky, kx, c_in, n] row-major flatten matches the kernel's
    # (ky-major, kx, c_in) im2col column order
    w_flat = (w / 255.0).reshape(216, c).astype(jnp.bfloat16)
    b = np.asarray(l0_params['b'], np.float32).reshape(1, c)
    return jnp.asarray(w_flat), jnp.asarray(b)


@functools.partial(jax.jit, static_argnames=('rows_per_band',))
def l0_fused(images_u8, w_im2col, bias, rows_per_band=32):
    """
    Fused folded-l0 forward from raw u8 images.

    Args:
        images_u8: [B, H, W, 3] uint8 (H, W multiples of 4)
        w_im2col / bias: from prepare_l0_weights
        rows_per_band: output rows computed per grid step

    Returns:
        [B, H//2, W//4, 2*C0] bf16 — the folded l0 output (identical
        contract to models/yolov5._apply_folded_layer(i=0) + SiLU).
    """

    b, h, w, c = images_u8.shape
    assert c == 3 and h % 4 == 0 and w % 4 == 0
    wf = w // 4
    h_out = h // 2
    r = rows_per_band
    assert h_out % r == 0, \
        'rows_per_band {} must divide H/2 = {}'.format(r, h_out)
    n_out = w_im2col.shape[1]

    # One padded u8 staging copy: row halo 2 (conv pad 2), folded-col
    # halo 1 (conv pad 1 in the folded layout)
    xf = images_u8.reshape(b, h, wf, 12)
    # Folded-col halo is (1, 1); pad the right side so the flat row
    # width (wfp*12) is 128-lane aligned (wfp % 32 == 0), and pad 4
    # extra bottom rows so every 8-aligned (2r+8)-row DMA slice stays
    # in bounds. The flat [B, Hp, wfp*12] view is what the kernel
    # slices — see _l0_kernel.
    pad_r = 1 + (-(wf + 2)) % 32
    wfp = wf + 1 + pad_r
    xp = jnp.pad(xf, ((0, 0), (2, 6), (1, pad_r), (0, 0)))
    xp = xp.reshape(b, h + 8, wfp * 12)

    grid = (b, h_out // r)
    out = pl.pallas_call(
        functools.partial(_l0_kernel, rows_per_band=r, wf=wf),
        grid=grid,
        in_specs=[
            pl.BlockSpec((216, n_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, r, wf, n_out),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, wf, n_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2 * r + 8, wfp * 12), jnp.uint8),
            pltpu.VMEM((r * wf, 216), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(w_im2col, bias, xp)
    return out
