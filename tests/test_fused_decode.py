"""
Fused decode+selection (ops/decode.select_topk_candidates) must match the
unfused reference path (yolov5.apply(decode=True) -> batched_nms) —
same candidates, same final detections.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import batched_nms, nms_on_candidates


@pytest.fixture(scope='module')
def small_model():
    config = yolov5.YoloV5Config('yolov5n6', num_classes=3)
    params = yolov5.init_params(config, seed=7)
    return config, params


def _run_both(config, params, x, conf_thres, k, dtype=None):
    # jit the full paths: eager op-by-op dispatch of the n6 net costs
    # ~10x the compiled run on the single-core CI host

    @jax.jit
    def unfused(params, x, conf):
        pred = yolov5.apply(config, params, x, dtype=dtype)
        return batched_nms(pred, conf, jnp.float32(0.45),
                           max_det=100, pre_nms_topk=k)

    @jax.jit
    def fused_path(params, x, conf):
        heads = yolov5.apply(config, params, x, dtype=dtype,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, k)
        return nms_on_candidates(cands, jnp.float32(0.45), max_det=100)

    ref = unfused(params, x, jnp.float32(conf_thres))
    fused = fused_path(params, x, jnp.float32(conf_thres))
    return jax.device_get(ref), jax.device_get(fused)


def _as_detection_set(out, b):
    dets = []
    for i in range(out['valid'].shape[1]):
        if not out['valid'][b, i]:
            continue
        dets.append((int(out['classes'][b, i]),
                     round(float(out['scores'][b, i]), 4),
                     tuple(np.round(out['boxes'][b, i], 1))))
    return dets


def test_fused_matches_unfused_f32(small_model):
    config, params = small_model
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 192, 192, 3)), jnp.float32)

    ref, fused = _run_both(config, params, x, 0.005, 512)
    for b in range(2):
        ref_set = _as_detection_set(ref, b)
        fused_set = _as_detection_set(fused, b)
        assert len(ref_set) == len(fused_set)
        for (rc, rs, rb), (fc, fs, fb) in zip(ref_set, fused_set):
            assert rc == fc
            assert abs(rs - fs) < 1e-3
            np.testing.assert_allclose(rb, fb, atol=0.5)


def test_fused_matches_unfused_bf16(small_model):
    """bf16 heads (the production dtype): fused and unfused paths see the
    same logits, so candidate sets must agree within score tolerance."""

    config, params = small_model
    params16 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)), jnp.float32)

    ref, fused = _run_both(config, params16, x, 0.005, 512,
                           dtype=jnp.bfloat16)
    ref_set = _as_detection_set(ref, 0)
    fused_set = _as_detection_set(fused, 0)
    # Same count; scores within the reference golden tolerance
    assert len(ref_set) == len(fused_set)
    for (rc, rs, rb), (fc, fs, fb) in zip(ref_set, fused_set):
        assert rc == fc
        assert abs(rs - fs) < 5e-3
        np.testing.assert_allclose(rb, fb, atol=1.0)


def test_selection_respects_conf_floor(small_model):
    config, params = small_model
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)), jnp.float32)
    heads = yolov5.apply(config, params, x, decode=False)

    # A high floor must mark low-score candidates invalid
    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.9), 128)
    got = jax.device_get(cands)
    assert not np.any(got['scores'][got['valid']] <= 0.9)
    # Invalid tail is score-padded with -1
    assert np.all(got['scores'][~got['valid']] <= 0.0)


def test_per_level_topk_equals_global(small_model):
    """Per-level top-k + merge must equal a global top-k over all levels
    whenever k <= each level's size (selection-equivalence argument in
    ops/decode.py)."""

    config, params = small_model
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)), jnp.float32)

    pred = yolov5.apply(config, params, x)
    heads = yolov5.apply(config, params, x, decode=False)
    k = 64

    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.0005), k)

    p = jax.device_get(pred)[0]
    obj = p[:, 4]
    score = (p[:, 5:] * p[:, 4:5]).max(axis=-1)
    valid = (obj > 0.0005) & (score > 0.0005)
    ranked = np.where(valid, score, -1.0)
    ref_top = np.sort(ranked)[::-1][:k]

    got = np.sort(np.asarray(jax.device_get(cands['scores'][0])))[::-1]
    np.testing.assert_allclose(got, ref_top, atol=1e-5)


def _toy_ranked():
    """[3, 64] ranked map: positives (incl. an exact score tie), one
    single-candidate row, one all-invalid row; invalid slots are -1."""
    ranked = np.full((3, 64), -1.0, np.float32)
    ranked[0, 9] = 0.9
    ranked[0, 5] = 0.5
    ranked[0, 33] = 0.5   # tie with index 5: top_k puts 5 first
    ranked[1, 10] = 0.25
    return jnp.asarray(ranked), jnp.asarray([3, 1, 0], jnp.int32)


def test_verified_approx_resorts_to_exact_topk_order(monkeypatch):
    """A complete-but-shuffled approx set must come out in exact
    lax.top_k order (score desc, tie -> lower index first)."""

    from megadetector_tpu.ops import decode

    def shuffled(ranked, k):
        s, i = jax.lax.top_k(ranked, k)
        return s[..., ::-1], i[..., ::-1]

    monkeypatch.setattr(decode, '_approx_max_k', shuffled)
    ranked, n_above = _toy_ranked()
    got_s, got_i = jax.device_get(
        decode._verified_approx_topk(ranked, 8, n_above))
    exact_s, exact_i = jax.device_get(jax.lax.top_k(ranked, 8))
    np.testing.assert_array_equal(got_s, exact_s)
    # Same 8-element set reversed: even the -1 fillers re-sort to
    # top_k's tie order (ascending index), so indices match everywhere
    np.testing.assert_array_equal(got_i, exact_i)


def test_verified_approx_fast_branch_actually_runs(monkeypatch):
    """With all positives captured but different filler slots, the fast
    branch keeps the mock's fillers — proof the cond did NOT fall back —
    while every slot that matters (score > 0) matches exact top_k."""

    from megadetector_tpu.ops import decode

    def odd_fillers(ranked, k):
        s, i = jax.lax.top_k(ranked, k)
        n = ranked.shape[-1]
        high = jnp.arange(n - 1, n - 1 - k, -1, dtype=i.dtype)
        high = jnp.broadcast_to(high, i.shape)
        return jnp.where(s > 0, s, -1.0), jnp.where(s > 0, i, high)

    monkeypatch.setattr(decode, '_approx_max_k', odd_fillers)
    ranked, n_above = _toy_ranked()
    got_s, got_i = jax.device_get(
        decode._verified_approx_topk(ranked, 8, n_above))
    exact_s, exact_i = jax.device_get(jax.lax.top_k(ranked, 8))
    np.testing.assert_array_equal(got_s, exact_s)
    n_above = np.asarray(n_above)
    for b in range(3):
        np.testing.assert_array_equal(got_i[b, :n_above[b]],
                                      exact_i[b, :n_above[b]])
    # Fillers differ from exact's -> the approx branch produced them
    assert not np.array_equal(got_i, exact_i)


def test_verified_approx_falls_back_on_missed_candidate(monkeypatch):
    """A lossy approx set (top candidate dropped) must trigger the
    exact-top_k fallback: output identical to lax.top_k in every slot."""

    from megadetector_tpu.ops import decode

    def lossy(ranked, k):
        s, i = jax.lax.top_k(ranked, k)
        # Drop each row's best candidate
        s = s.at[..., 0].set(-1.0)
        return s, i

    monkeypatch.setattr(decode, '_approx_max_k', lossy)
    ranked, n_above = _toy_ranked()
    got_s, got_i = jax.device_get(
        decode._verified_approx_topk(ranked, 8, n_above))
    exact_s, exact_i = jax.device_get(jax.lax.top_k(ranked, 8))
    np.testing.assert_array_equal(got_s, exact_s)
    np.testing.assert_array_equal(got_i, exact_i)


def test_select_topk_approx_matches_exact_e2e(small_model):
    """select_topk_candidates(approx=True) (the default) must equal the
    approx=False path on real head outputs."""

    config, params = small_model
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 192, 192, 3)), jnp.float32)
    heads = yolov5.apply(config, params, x, decode=False)

    a = jax.device_get(select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.005), 128, approx=True))
    e = jax.device_get(select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.005), 128, approx=False))
    np.testing.assert_array_equal(a['scores'], e['scores'])
    np.testing.assert_array_equal(a['classes'][a['valid']],
                                  e['classes'][e['valid']])
    np.testing.assert_array_equal(a['boxes_cxcywh'][a['valid']],
                                  e['boxes_cxcywh'][e['valid']])


@pytest.mark.parametrize('approx', [True, False])
def test_select_channel_major_matches_row_major(small_model, approx):
    """The channel-major selection layout (_select_level_cm) must
    produce the same candidate set: same sorted scores, and identical
    boxes/classes wherever scores are distinct (random logits make
    exact ties measure-zero)."""

    config, params = small_model
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(0, 1, (2, 192, 256, 3)), jnp.float32)
    heads = yolov5.apply(config, params, x, decode=False)

    rm = jax.device_get(select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.005), 128, approx=approx, channel_major=False))
    cm = jax.device_get(select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        jnp.float32(0.005), 128, approx=approx, channel_major=True))

    np.testing.assert_array_equal(cm['scores'], rm['scores'])
    np.testing.assert_array_equal(cm['valid'], rm['valid'])
    np.testing.assert_array_equal(cm['n_candidates'], rm['n_candidates'])
    v = rm['valid']
    np.testing.assert_array_equal(cm['classes'][v], rm['classes'][v])
    np.testing.assert_array_equal(cm['boxes_cxcywh'][v],
                                  rm['boxes_cxcywh'][v])


def test_select_channel_major_single_class(small_model):
    """nc=1 exercises the class-agnostic shape corner (cls axis of 1)."""

    config, _ = small_model
    cfg1 = yolov5.YoloV5Config('yolov5n6', num_classes=1)
    params1 = yolov5.init_params(cfg1, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)), jnp.float32)
    heads = yolov5.apply(cfg1, params1, x, decode=False)

    rm = jax.device_get(select_topk_candidates(
        heads, cfg1.anchors, cfg1.strides, 1,
        jnp.float32(0.005), 64, channel_major=False))
    cm = jax.device_get(select_topk_candidates(
        heads, cfg1.anchors, cfg1.strides, 1,
        jnp.float32(0.005), 64, channel_major=True))
    np.testing.assert_array_equal(cm['scores'], rm['scores'])
    v = rm['valid']
    np.testing.assert_array_equal(cm['boxes_cxcywh'][v],
                                  rm['boxes_cxcywh'][v])


@pytest.mark.parametrize('channel_major', [False, True])
def test_saturated_logit_class_tiebreak(channel_major):
    """When two class logits both saturate sigmoid-f32 to exactly 1.0
    (logit > ~16.6), the reference argmaxes in SIGMOID space and
    tie-breaks to the lower class index (pytorch_detector.py:502-610);
    a raw-logit argmax would report the larger logit's class instead.
    Both selection layouts must reproduce the reference rule."""

    b, h, w, na, nc = 1, 2, 2, 1, 3
    raw = np.full((b, h, w, na * (5 + nc)), -20.0, np.float32)
    # one hot cell: centered box, confident objectness, classes 1 and 2
    # both saturated (sigmoid(18) == sigmoid(20) == 1.0 in f32)
    raw[0, 1, 1, :] = [0.0, 0.0, 0.0, 0.0, 8.0, -5.0, 20.0, 18.0]
    sat = np.float32(1.0 / (1.0 + np.exp(-18.0)))
    assert sat == np.float32(1.0)  # the premise of the tie

    anchors = jnp.asarray([[[16.0, 16.0]]], jnp.float32)
    out = jax.device_get(select_topk_candidates(
        [jnp.asarray(raw)], anchors, (8,), nc,
        jnp.float32(0.1), 4, approx=False, channel_major=channel_major))
    assert bool(out['valid'][0, 0])
    # class index 1 (logit 20) vs 2 (logit 18): sigmoid-space argmax
    # keeps 1 here; but with the order swapped the LOWER index must win
    assert int(out['classes'][0, 0]) == 1

    raw2 = raw.copy()
    raw2[0, 1, 1, 5:] = [-5.0, 18.0, 20.0]  # larger logit at HIGHER idx
    out2 = jax.device_get(select_topk_candidates(
        [jnp.asarray(raw2)], anchors, (8,), nc,
        jnp.float32(0.1), 4, approx=False, channel_major=channel_major))
    assert bool(out2['valid'][0, 0])
    assert int(out2['classes'][0, 0]) == 1, \
        'saturated tie must resolve to the lower class index'
