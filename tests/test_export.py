"""Serving-export tests (evals/export.py): the jax.export StableHLO
artifact must round-trip through serialize/deserialize and reproduce
the direct forward, including at batch sizes unseen at export time
(symbolic batch dim)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partseg_tpu.evals.export import export_infer, make_infer_fn
from partseg_tpu.models.partnet import PartNet, PartNetConfig

CFG = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                    app_features=8, decoder_scales=2, use_pallas=False)


@pytest.fixture(scope="module")
def model_params():
    model = PartNet(CFG)
    x = jnp.zeros((1, 16, 16, 3))
    return model, model.init(jax.random.key(0), x, x)


def _rand(batch):
    return np.random.default_rng(0).uniform(
        size=(batch, 16, 16, 3)
    ).astype(np.float32)


def test_export_roundtrip_symbolic_batch(model_params):
    model, params = model_params
    exported = export_infer(model, params, img_size=16, batch=None,
                            platforms=("cpu",))
    reloaded = jax.export.deserialize(bytearray(exported.serialize()))
    direct = jax.jit(make_infer_fn(model, params))
    # Two different batch sizes through ONE artifact (symbolic dim).
    for b in (1, 5):
        x = _rand(b)
        got, want = reloaded.call(x), direct(x)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-5, atol=1e-5, err_msg=k)
        assert got["seg"].shape == (b, 8, 8)
        assert got["landmarks"].shape == (b, 3, 2)


def test_export_static_batch_rejects_other_batch(model_params):
    model, params = model_params
    exported = export_infer(model, params, img_size=16, batch=2,
                            platforms=("cpu",))
    exported.call(_rand(2))  # matching batch works
    with pytest.raises(Exception):
        exported.call(_rand(3))


def test_export_seg_labels_background_zero(model_params):
    model, params = model_params
    exported = export_infer(model, params, img_size=16, batch=None,
                            platforms=("cpu",))
    seg = np.asarray(exported.call(_rand(2))["seg"])
    # bg relabeled to 0, parts 1..K (GCPR'20 convention), int dtype.
    assert seg.dtype == np.int32
    assert seg.min() >= 0 and seg.max() <= CFG.n_parts
