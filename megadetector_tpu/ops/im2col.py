"""
im2col-GEMM execution for thin-input convolutions (the stem).

Why: the TPU MXU contracts 128 lanes per pass; a conv whose input has
C_in=3 (raw stem) or C_in=12 (width-folded stem, ops/folding.py)
contracts only C_in lanes per kernel tap through XLA's conv emitter —
the hardware-profiled l0..l1 block runs at an effective ~33 TOP/s
(~9% lane utilization) and costs ~30 ms of a 146 ms b64 step
(experiments/exp_int8_stage_profile.py). Rewriting the conv as
patch-extraction (kh*kw strided slices concatenated on the channel
axis) followed by ONE [*, kh*kw*C_in] @ [kh*kw*C_in, C_out] dot raises
the contraction depth to kh*kw*C_in (216 for the folded stem — 84%
lane utilization over two passes).

The patch tensor materializes in HBM (kh*kw times the input bytes), so
this only pays off when the utilization win dominates — hence the
eligibility gate on thin inputs. Mathematically this is the same
multiply-accumulate set as the conv; only the f32 accumulation order
changes (like ops/folding.py, disabled by the 'classic-strict'
compatibility mode for bit-level graph reproduction).

No reference counterpart: the reference runs its stem through cuDNN
(megadetector/detection/pytorch_detector.py:1313); this is TPU lane
layout engineering for the same operation.
"""

import jax
import jax.numpy as jnp

# Trace-time process-global, same pattern as quantization._CONV_BACKEND:
# the detector re-asserts its own setting before building programs.
_STEM_GEMM = False


def set_stem_gemm(on):
    global _STEM_GEMM
    _STEM_GEMM = bool(on)


def get_stem_gemm():
    return _STEM_GEMM


def eligible(w_shape):
    """Thin-input convs where im2col-GEMM beats the conv emitter."""

    kh, kw, cin = w_shape[0], w_shape[1], w_shape[2]
    return cin <= 16 and kh * kw * cin <= 512


def routes(w_shape):
    return _STEM_GEMM and eligible(w_shape)


def conv_im2col(x, w, strides, pads):
    """
    NHWC conv as patch-slices + one GEMM. Same contract as
    lax.conv_general_dilated(x, w, strides, pads, NHWC/HWIO/NHWC):
    float x/w, f32 accumulation, output in x.dtype.

    Args:
        x: [B, H, W, C_in] float
        w: [kh, kw, C_in, C_out] float
        strides: (sh, sw)
        pads: ((pt, pb), (pl, pr))
    """

    kh, kw, cin, cout = w.shape
    sh, sw = strides
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    b, hp, wp, _ = xp.shape
    ho = (hp - kh) // sh + 1
    wo = (wp - kw) // sw + 1

    cols = []
    for ky in range(kh):
        for kx in range(kw):
            cols.append(jax.lax.slice(
                xp, (0, ky, kx, 0),
                (b, ky + (ho - 1) * sh + 1, kx + (wo - 1) * sw + 1, cin),
                (1, sh, sw, 1)))
    patches = jnp.concatenate(cols, axis=-1)     # [B, ho, wo, kh*kw*cin]

    y = jax.lax.dot_general(
        patches.reshape(b * ho * wo, kh * kw * cin),
        w.reshape(kh * kw * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(b, ho, wo, cout)
