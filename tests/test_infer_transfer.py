"""Inference + appearance-transfer entry-point tests (SURVEY.md §3.2, §3.4)."""

import numpy as np
import jax
import pytest

from partseg_tpu.evals.infer import infer_image, render_overlay
from partseg_tpu.evals.transfer import transfer
from partseg_tpu.models.partnet import PartNet, PartNetConfig

CFG = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                    app_features=8, decoder_scales=2, use_pallas=False)


@pytest.fixture(scope="module")
def model_params():
    model = PartNet(CFG)
    import jax.numpy as jnp

    x = jnp.zeros((1, 16, 16, 3))
    return model, model.init(jax.random.key(0), x, x)


def test_infer_image_outputs(model_params):
    model, params = model_params
    img = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = infer_image(model, params, img)
    assert out["heatmaps"].shape == (8, 8, 3)
    assert out["seg"].shape == (8, 8)
    assert out["landmarks"].shape == (3, 2)
    # Background channel relabeled to 0; parts are 1..K.
    assert out["seg"].min() >= 0 and out["seg"].max() <= 3
    viz = render_overlay(img, out)
    assert viz.shape == (16, 16, 3)
    assert viz.min() >= 0 and viz.max() <= 1


def test_transfer_shapes(model_params):
    model, params = model_params
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = transfer(model, params, a, b)
    assert out.shape == (16, 16, 3)
    assert np.isfinite(out).all()
    # Transfer with appearance from a different image differs from the
    # self-reconstruction.
    self_out = transfer(model, params, a, a)
    assert np.abs(out - self_out).max() > 1e-6
