"""
Pallas TPU kernel for the chained-int8 3x3 stride-1 conv.

The int8 activation chain (ops/quantization.py) runs its convs through
XLA's conv emitter at a hardware-measured 133-176 TOP/s on v5e; a
Pallas kernel doing the same 9-tap int8 MXU accumulation with the
dequant+bias+SiLU+requant epilogue fused in-VMEM reaches 146-190 TOP/s
at the l6 bulk shapes (experiments/exp_pallas_conv3x3*.py), and never
materializes the i32/f32 intermediate in HBM.

Layout: grid (B, H/bh). Each step sees its row band plus 1-row halo
refs above/below (clamped index maps, masked to zero at the image
edges — exact for SAME padding because the symmetric-int8 zero point
is 0), builds the column-padded tile in VMEM, and accumulates nine
shifted [bh*W, C] @ [C, Cout] taps into an i32 register block before
the fused epilogue writes int8.

Used by quantization.chained_conv when the conv backend is 'pallas'
(set via detector_options conv_backend=pallas; TPU only — on other
backends the XLA path is used regardless). Numerics: identical math to
the XLA path (f32 epilogue, same rounding); interpret-mode tests pin
exact equality.

STATUS (updated 2026-08-19): correct and opt-in, NOT the default.
Isolated conv chains win +4-9% over XLA. The round-3 "e2e-neutral"
verdict (384.0 vs 386.4 img/s @b64) was an INVALID measurement — the
A/B reused one step function across set_conv_backend() calls and
jax.jit's function-identity cache re-ran the first backend's program
both times (see exp_e2e_pallas_conv.py's INVALID-RESULT NOTE). The
fused-bottleneck kernel (ops/pallas_bottleneck.py) supersedes this
kernel on the bottleneck 3x3s; exp_e2e_bottleneck.py carries the
valid e2e A/B. The known next lever — a bf16 VPU
epilogue, worth ~15% at the high-res layers (exp_pallas_conv3x3b nosilu
bound) — is blocked by a Mosaic verifier bug on this toolchain: ANY
bf16 vector math in the epilogue (even sigmoid alone, with explicit
2D broadcasts) fails with "'vector.broadcast' op failed to verify"
(exp_pallas_conv3x3d.py). Revisit on toolchain updates; flip the
default only if e2e wins and the int8 stored golden holds.

No reference counterpart: the reference runs torch convs
(megadetector/detection/pytorch_detector.py:1313); this is TPU-side
layout engineering for the same operation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Band heights tried in order; the first that divides H is used.
_BAND_CANDIDATES = (40, 32, 30, 24, 20, 16, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1)


def supports(x_shape, w_shape, stride, pad):
    """
    True when the Pallas kernel covers this conv: 3x3, stride 1,
    SAME pad, lane-aligned channels, sublane-aligned width.
    """

    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    if stride not in (1, (1, 1)):
        return False
    if pad not in (1, (1, 1)):
        return False
    _, h, w, c = x_shape
    cout = w_shape[-1]
    if c % 128 != 0 or cout % 128 != 0:
        return False
    if w % 8 != 0 or h < 2:
        return False
    # VMEM guard: weights + one double-buffered band + acc must fit
    # comfortably (~16 MB VMEM); 9*C*Cout int8 weights dominate.
    if 9 * c * cout > 6 * 1024 * 1024:
        return False
    return True


def _pick_band(h):
    for cand in _BAND_CANDIDATES:
        if h % cand == 0:
            return cand
    return 1


def _kernel(top_ref, x_ref, bot_ref, w_ref, sc_ref, b_ref, o_ref, *,
            n_bands, inv_y, interpret):
    i = pl.program_id(1)
    bh, w, c = x_ref.shape[1:]
    cout = o_ref.shape[-1]

    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n_bands - 1, jnp.zeros_like(bot_ref[0]),
                    bot_ref[0])
    x = jnp.concatenate([top, x_ref[0], bot], axis=0)   # (bh+2, W, C)
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))            # (bh+2, W+2, C)

    acc = jnp.zeros((bh * w, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * sc_ref[0] + b_ref[0]
    y = y * jax.nn.sigmoid(y)
    out = jnp.clip(jnp.round(y * np.float32(inv_y)),
                   -127, 127).astype(jnp.int8)
    o_ref[0] = out.reshape(bh, w, cout)


def conv3x3_chain(x_q, w_q, scale, bias, y_scale, interpret=False):
    """
    int8 3x3 stride-1 SAME conv with the chain epilogue fused.

    Args:
        x_q: [B, H, W, C] int8 at the producer's (folded) scale
        w_q: [3, 3, C, Cout] int8
        scale: [Cout] f32 — w_scale * x_scale, the folded dequant
            multiplier
        bias: [Cout] f32
        y_scale: python float — output grid
        interpret: run in Pallas interpret mode (tests / non-TPU)

    Returns:
        [B, H, W, Cout] int8 at y_scale
    """

    bsz, h, w, c = x_q.shape
    cout = w_q.shape[-1]
    bh = _pick_band(h)
    n_bands = h // bh

    kern = functools.partial(
        _kernel, n_bands=n_bands, inv_y=1.0 / float(y_scale),
        interpret=interpret)

    return pl.pallas_call(
        kern,
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, h - 1),
                                       0, 0)),
            pl.BlockSpec((3, 3, c, cout), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(x_q, x_q, x_q, w_q,
      jnp.asarray(scale, jnp.float32).reshape(1, cout),
      jnp.asarray(bias, jnp.float32).reshape(1, cout))
