"""
Pallas TPU kernel for a FUSED int8 CSP bottleneck: 1x1 conv -> 3x3
conv -> (optional) residual add, one kernel, one HBM round trip.

Why a whole bottleneck and not one conv: the per-conv Pallas kernel
(ops/pallas_conv.py) wins isolated (+4-9%) but measured e2e-neutral —
the pallas_call boundary blocks XLA's fusion of the surrounding
requant/add epilogues, giving back exactly what the kernel saved. The
bottleneck is the natural fusion unit: its boundary is int8-in /
int8-out with nothing left outside to fuse. HBM activation traffic per
bottleneck drops from ~5 channel-bytes/pixel (read y1, write h1, read
h1+halo, read y1 again for the add, write out) to 2 (read y1 + halo,
write out), and the h1 intermediate never exists in HBM.

Numerics vs the XLA chain path (quantization.chained_conv + qt_add):
the 1x1's output is rounded to int8 at its calibrated y_scale in-VMEM
(exactly the materialized QTensor the XLA path makes), the 3x3's
output is rounded at ITS y_scale before the residual dequant-add, and
the sum is requantized at the qt_add bound scale (s_in + s_cv2).
Interpret-mode tests pin the conv stages bit-exact; across the
residual dequant-add-requant, FMA contraction (the fused form keeps
the h*scale product at full precision where the eager op-by-op path
rounds it to f32) can flip a rounding by 1 lsb on near-tie elements —
tests bound that at <=1 lsb on <=5% of elements.

Layout: grid (B, H/bh), row bands with 1-row x halos (clamped index
maps). The 1x1 runs over the band PLUS both halo rows so the 3x3 has
its h1 halo in-VMEM; at image edges the h1 halo is zeroed (SAME padding
pads the 3x3's INPUT h1 with zeros — the symmetric-int8 zero point is
exact zero — NOT the x rows, so the x-halo masking of pallas_conv would
be wrong here). Mosaic double-buffers the band/halo fetches across grid
steps (the pipelined BlockSpec machinery), i.e. the halo DMA for band
i+1 overlaps band i's MXU work.

Reference counterpart: none — the reference runs these as separate
torch convs (megadetector/detection/pytorch_detector.py:1313); this is
TPU memory-hierarchy engineering for the same subgraph.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Band heights tried in order; first that divides H and fits VMEM wins
_BAND_CANDIDATES = (40, 32, 30, 24, 20, 16, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1)

# Soft VMEM budget for weights + working set (bytes); v5e has 16 MB
_VMEM_BUDGET = 10 * 1024 * 1024

# cv2 contraction variants (VERDICT-r4 item 2): 'taps' = nine shifted
# (M, C) x (C, C) dots at K=C (the round-4 row-band form); 'im2col' =
# build the (M, 9C) patch matrix in VMEM (nine 128-lane-aligned column
# stores) and run ONE output-stationary dot at K=9C — the deep-K layout
# the 202.5 TOP/s Pallas matmul proved (exp_pallas_int8_matmul);
# 'im2col3' = per-dy (M, 3C) patches, three dots at K=3C (same store
# volume, shallower dots, 1/3 the scratch). All three compute the same
# exact integer contraction — outputs are bit-identical (tested, and
# checksummed on hardware).
#
# MEASURED (r5, exp_bottleneck_os, v5e, b64, 3 chained bottlenecks):
# the K-contracted forms LOSE at every C3 shape — l2's 240x160x128:
# xla 127.2 / taps 112.9 / im2col 93.4 / im2col3 90.5 eff TOP/s;
# 60x80x256 is the only shape where im2col beats taps (145.2 vs
# 133.8) and it still trails xla (152.6). The in-VMEM patch
# materialization (nine column stores + one full re-read) costs more
# than the deeper dots save; the 202.5 TOP/s matmul layout does not
# transfer when the patches must be constructed. Kept for future
# Mosaic stacks; production default stays 'taps' behind the default
# 'xla' backend.
VARIANTS = ('taps', 'im2col', 'im2col3')

# Trace-time process-global (same rationale as quantization's
# _CONV_BACKEND: the choice lives deep inside model apply functions).
_VARIANT = 'taps'


def set_variant(variant):
    global _VARIANT
    assert variant in VARIANTS, variant
    _VARIANT = variant


def get_variant():
    return _VARIANT


def _band_bytes(bh, w, c, variant='taps'):
    """Rough working-set estimate for one grid step: int8 x band with
    halos, int8 h1 band, i32 accumulator, one f32 epilogue temp, and
    the im2col patch scratch when the variant builds one."""

    base = (bh + 2) * w * c * (1 + 1 + 4) + bh * w * c * 4
    if variant == 'im2col':
        base += bh * w * 9 * c
    elif variant == 'im2col3':
        base += bh * w * 3 * c
    return base


def _pick_band(h, w, c, variant='taps'):
    for cand in _BAND_CANDIDATES:
        if h % cand == 0 and \
                _band_bytes(cand, w, c, variant) <= _VMEM_BUDGET // 2:
            return cand
    return None


def supports(x_shape, w1_shape, w2_shape, variant='taps'):
    """
    True when the fused kernel covers this bottleneck: cv1 1x1 C->C,
    cv2 3x3 stride-1 SAME C->C, lane-aligned channels, sublane-aligned
    width, weights + band fit VMEM.
    """

    if len(w1_shape) != 4 or w1_shape[:2] != (1, 1):
        return False
    if len(w2_shape) != 4 or w2_shape[:2] != (3, 3):
        return False
    _, h, w, c = x_shape
    if w1_shape[2] != c or w1_shape[3] != c:
        return False
    if w2_shape[2] != c or w2_shape[3] != c:
        return False
    if c % 128 != 0 or w % 8 != 0 or h < 2:
        return False
    if 10 * c * c > _VMEM_BUDGET // 2:
        return False
    return _pick_band(h, w, c, variant) is not None


def _kernel(top_ref, x_ref, bot_ref, w1_ref, w2_ref, sc1_ref, b1_ref,
            sc2_ref, b2_ref, o_ref, *scratch, n_bands, mid_scale,
            cv2_scale, s_in, out_scale, shortcut, variant):
    i = pl.program_id(1)
    bh, w, c = x_ref.shape[1:]

    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n_bands - 1, jnp.zeros_like(bot_ref[0]),
                    bot_ref[0])
    x = jnp.concatenate([top, x_ref[0], bot], axis=0)   # (bh+2, W, C)

    # --- cv1: 1x1 over band + halo rows, requant to its y_scale ---
    a1 = jax.lax.dot_general(
        x.reshape((bh + 2) * w, c), w1_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h1 = a1.astype(jnp.float32) * sc1_ref[0] + b1_ref[0]
    h1 = h1 * jax.nn.sigmoid(h1)
    # qt_quantize divides by the f32 scale; dividing (not multiplying
    # by a reciprocal) keeps rounding bit-exact vs the XLA chain path
    h1q = jnp.clip(jnp.round(h1 / np.float32(mid_scale)),
                   -127, 127).astype(jnp.int8).reshape(bh + 2, w, c)

    # SAME padding for the 3x3 pads ITS input (h1) with zeros at image
    # edges; the x-derived halo rows are only valid interior rows
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w, c), 0)
    edge = ((rows == 0) & (i == 0)) | \
           ((rows == bh + 1) & (i == n_bands - 1))
    h1q = jnp.where(edge, jnp.int8(0), h1q)
    h1q = jnp.pad(h1q, ((0, 0), (1, 1), (0, 0)))        # (bh+2, W+2, C)

    # --- cv2: same exact integer contraction, three MXU schedules ---
    if variant == 'im2col':
        # Output-stationary deep-K form: materialize the (M, 9C) patch
        # matrix (nine 128-lane-aligned column stores of already-VMEM
        # slices), then ONE K=9C dot. w2_ref arrives reshaped (9C, C),
        # row order (dy, dx, c_in) == the column-store order here.
        patches = scratch[0]
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                patches[:, t * c:(t + 1) * c] = \
                    h1q[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
        acc = jax.lax.dot_general(
            patches[:], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    elif variant == 'im2col3':
        # Per-dy (M, 3C) patches, three K=3C dots; w2_ref is (3, 3C, C)
        patches = scratch[0]
        acc = jnp.zeros((bh * w, c), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                patches[:, dx * c:(dx + 1) * c] = \
                    h1q[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
            acc = acc + jax.lax.dot_general(
                patches[:], w2_ref[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    else:
        # nine shifted flat taps at K=C (round-4 form)
        acc = jnp.zeros((bh * w, c), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                xs = h1q[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
                acc = acc + jax.lax.dot_general(
                    xs, w2_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * sc2_ref[0] + b2_ref[0]
    y = y * jax.nn.sigmoid(y)
    # Round at cv2's y_scale first — the XLA path materializes this
    # QTensor, so skipping the round would (slightly) change numerics
    h2q = jnp.clip(jnp.round(y / np.float32(cv2_scale)), -127, 127)

    if shortcut:
        resid = x_ref[0].reshape(bh * w, c).astype(jnp.float32) * \
            np.float32(s_in)
        y = resid + h2q * np.float32(cv2_scale)
        out = jnp.clip(jnp.round(y / np.float32(out_scale)),
                       -127, 127).astype(jnp.int8)
    else:
        out = h2q.astype(jnp.int8)
    o_ref[0] = out.reshape(bh, w, c)


def bottleneck_chain(x_q, w1_q, scale1, bias1, mid_scale, w2_q, scale2,
                     bias2, cv2_scale, s_in, shortcut, interpret=False,
                     variant='taps'):
    """
    Fused int8 bottleneck: h = silu-conv1x1(x); h = silu-conv3x3(h);
    out = x + h (shortcut) or h.

    Args:
        x_q: [B, H, W, C] int8 at scale s_in
        w1_q: [1, 1, C, C] int8; scale1: [C] f32 = w1_scale * s_in;
            bias1: [C] f32; mid_scale: float — cv1's calibrated y_scale
        w2_q: [3, 3, C, C] int8; scale2: [C] f32 = w2_scale * mid_scale;
            bias2: [C] f32; cv2_scale: float — cv2's calibrated y_scale
        s_in: float — x's scale (the residual dequant factor)
        shortcut: python bool
        interpret: Pallas interpret mode (tests / non-TPU)
        variant: cv2 contraction schedule (see VARIANTS) — outputs are
            bit-identical across variants

    Returns:
        [B, H, W, C] int8 at scale (s_in + cv2_scale) when shortcut,
        else cv2_scale — exactly quantization.qt_add's bound scale.
    """

    assert variant in VARIANTS, variant
    bsz, h, w, c = x_q.shape
    bh = _pick_band(h, w, c, variant)
    n_bands = h // bh
    out_scale = (s_in + cv2_scale) if shortcut else cv2_scale

    kern = functools.partial(
        _kernel, n_bands=n_bands,
        mid_scale=float(mid_scale), cv2_scale=float(cv2_scale),
        s_in=float(s_in), out_scale=float(out_scale),
        shortcut=bool(shortcut), variant=variant)

    if variant == 'im2col':
        w2_pass = w2_q.reshape(9 * c, c)
        w2_spec = pl.BlockSpec((9 * c, c), lambda b, i: (0, 0))
        scratch_shapes = [pltpu.VMEM((bh * w, 9 * c), jnp.int8)]
    elif variant == 'im2col3':
        w2_pass = w2_q.reshape(3, 3 * c, c)
        w2_spec = pl.BlockSpec((3, 3 * c, c), lambda b, i: (0, 0, 0))
        scratch_shapes = [pltpu.VMEM((bh * w, 3 * c), jnp.int8)]
    else:
        w2_pass = w2_q
        w2_spec = pl.BlockSpec((3, 3, c, c), lambda b, i: (0, 0, 0, 0))
        scratch_shapes = []

    out = pl.pallas_call(
        kern,
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, h - 1),
                                       0, 0)),
            pl.BlockSpec((1, 1, c, c), lambda b, i: (0, 0, 0, 0)),
            w2_spec,
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
        scratch_shapes=scratch_shapes,
    )(x_q, x_q, x_q, w1_q, w2_pass,
      jnp.asarray(scale1, jnp.float32).reshape(1, c),
      jnp.asarray(bias1, jnp.float32).reshape(1, c),
      jnp.asarray(scale2, jnp.float32).reshape(1, c),
      jnp.asarray(bias2, jnp.float32).reshape(1, c))
    return out, out_scale
