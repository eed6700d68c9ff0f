"""
Deterministic stub predictor implemented twice — in numpy (for the
reference-pipeline oracle) and in JAX (as a TPUDetector apply_fn) — so
full-pipeline golden tests compare the REAL post-forward chains (NMS,
scale_coords, truncation, MD formatting, canvas policy) over identical,
image-dependent, well-separated predictions with no random-weight
near-tie degeneracy.

The stub maps each stride-32 canvas cell to one prediction row:
objectness from local contrast (uniform 114-gray letterbox padding falls
below the 0.005 output floor), class scores and box geometry from local
channel means. Both implementations use float32 and the same operation
order; scores are separated by per-cell image noise, so torch/JAX
float differences (~1e-7) cannot flip orderings at the golden tolerances
(conf 0.005 / coord 0.001).
"""

import numpy as np

CELL = 32


class NumpyStubModel:
    """
    Drop-in for the torch mirror in reference_pipeline: __call__ takes a
    torch CHW float tensor in [0,1], returns a torch [B, A, 8] decoded
    prediction tensor in canvas pixels.
    """

    def __call__(self, x):
        import torch

        arr = x.detach().cpu().numpy().astype(np.float32)
        b, _, hgt, wid = arr.shape
        ny, nx = hgt // CELL, wid // CELL
        out = np.zeros((b, ny * nx, 8), np.float32)
        for bi in range(b):
            img = arr[bi].transpose(1, 2, 0)
            for ci in range(ny):
                for cj in range(nx):
                    patch = img[ci * CELL:(ci + 1) * CELL,
                                cj * CELL:(cj + 1) * CELL]
                    r, g, bl = patch.mean(axis=(0, 1))
                    std_all = np.float32(patch.std())
                    xx = (cj + 0.5) * CELL + (r - bl) * 8.0
                    yy = (ci + 0.5) * CELL + (g - r) * 8.0
                    ww = 12.0 + g * 80.0
                    hh = 12.0 + r * 80.0
                    obj = 1.0 / (1.0 + np.exp(
                        -(200.0 * std_all - 8.0)))
                    c0 = 0.15 + r * 0.8
                    c1 = 0.10 + g * 0.8
                    c2 = 0.05 + bl * 0.8
                    out[bi, ci * nx + cj] = (xx, yy, ww, hh, obj,
                                             c0, c1, c2)
        return torch.tensor(out)


def stub_apply(config, params, x, dtype=None):
    """
    JAX twin with the TPUDetector apply_fn signature: x is [B, H, W, 3]
    float in [0,1]; returns [B, A, 8] predictions in canvas pixels.
    """

    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    b, hgt, wid, _ = x.shape
    ny, nx = hgt // CELL, wid // CELL
    cells = x.reshape(b, ny, CELL, nx, CELL, 3)
    mean_rgb = cells.mean(axis=(2, 4))                      # [B,ny,nx,3]
    # std over the full 32*32*3 patch, matching numpy's patch.std()
    flat = cells.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, ny, nx, CELL * CELL * 3)
    std_all = flat.std(axis=-1)                             # [B,ny,nx]

    ci = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    cj = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    r, g, bl = mean_rgb[..., 0], mean_rgb[..., 1], mean_rgb[..., 2]
    xx = (cj + 0.5) * CELL + (r - bl) * 8.0
    yy = (ci + 0.5) * CELL + (g - r) * 8.0
    ww = 12.0 + g * 80.0
    hh = 12.0 + r * 80.0
    obj = 1.0 / (1.0 + jnp.exp(-(200.0 * std_all - 8.0)))
    c0 = 0.15 + r * 0.8
    c1 = 0.10 + g * 0.8
    c2 = 0.05 + bl * 0.8
    pred = jnp.stack([xx, yy, ww, hh, obj, c0, c1, c2], axis=-1)
    return pred.reshape(b, ny * nx, 8)


def make_stub_detector(checkpoint_path, detector_options=None):
    """A TPUDetector whose forward is the JAX stub."""

    from megadetector_tpu.models.detector import TPUDetector

    options = dict(detector_options or {})
    # Unique pre_nms_topk keeps the stub out of the cross-detector
    # compiled-program cache (the cache key doesn't cover _apply_fn);
    # must exceed the stub's candidate count (one per cell) so no
    # candidate is truncated relative to the uncapped oracle
    options.setdefault('pre_nms_topk', 131)
    detector = TPUDetector(checkpoint_path, detector_options=options)
    detector._apply_fn = stub_apply
    # The stub emits decoded predictions directly; the fused
    # head-logit candidate selection only applies to real yolov5 heads
    detector._fused_decode = False
    # Single-level stand-in: TTA's _clip_augmented (which drops detect
    # LEVELS) does not apply
    detector._tta_nl = 1
    return detector
