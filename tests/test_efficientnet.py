"""EfficientNetV2 classifier tests: shapes + torchvision cross-check."""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import efficientnet as effnet


def test_forward_shapes():
    cfg = effnet.EfficientNetConfig('efficientnetv2_s', num_classes=10)
    params = effnet.init_params(cfg, seed=0)
    x = np.random.RandomState(0).uniform(
        -1, 1, (2, 64, 64, 3)).astype(np.float32)
    logits = jax.jit(lambda p, x: effnet.apply(cfg, p, x))(params, x)
    assert logits.shape == (2, 10)
    assert bool(np.isfinite(np.asarray(logits)).all())


def test_torch_parity():
    torch = pytest.importorskip('torch')
    from torch_effnet_ref import make_torch_effnet

    model = make_torch_effnet('efficientnetv2_s', num_classes=7, seed=0)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = effnet.EfficientNetConfig('efficientnetv2_s', num_classes=7)
    params = effnet.convert_torchvision_state_dict(state, cfg)

    x = np.random.RandomState(2).uniform(
        -1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        torch_logits = model(
            torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_logits = np.asarray(effnet.apply(cfg, params, x))

    np.testing.assert_allclose(jax_logits, torch_logits,
                               atol=5e-3, rtol=1e-3)


def test_param_count_v2s():
    cfg = effnet.EfficientNetConfig('efficientnetv2_s', num_classes=1000)
    params = effnet.init_params(cfg)
    n = effnet.num_params(params)
    # torchvision efficientnet_v2_s has ~21.46M params
    assert 20e6 < n < 23e6
