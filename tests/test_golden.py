"""Golden-value regression tests (SURVEY.md §4.2): fixed-seed forwards
vs committed arrays — guards refactors, since no reference outputs
exist to diff against. Regenerate with tools/gen_golden.py after an
INTENTIONAL numerics change and say so in the commit message."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "golden.npz"


def compute_goldens() -> dict[str, np.ndarray]:
    from partseg_tpu.augment import AugmentConfig
    from partseg_tpu.augment.pair import make_pair
    from partseg_tpu.models.partnet import PartNet, PartNetConfig

    cfg = PartNetConfig(n_parts=4, img_size=32, features=32, depth=2,
                        app_features=16, decoder_scales=3, use_pallas=False)
    model = PartNet(cfg)
    x = jax.random.uniform(jax.random.key(11), (2, 32, 32, 3))
    params = model.init(jax.random.key(12), x, x)
    out = model.apply(params, x, x * 0.5 + 0.25)

    acfg = AugmentConfig()
    sampler = acfg.make_sampler()
    pair = make_pair(x, jax.random.key(13), sampler, acfg)
    return {
        "recon": np.asarray(out.recon, np.float32),
        "mu_a": np.asarray(out.mu_a),
        "sigma_a": np.asarray(out.sigma_a),
        "appearance": np.asarray(out.appearance),
        "x_s": np.asarray(pair["x_s"]),
        "x_a": np.asarray(pair["x_a"]),
        "tps_weights": np.asarray(pair["tps"].weights),
    }


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden file not generated")
def test_fixed_seed_forward_matches_golden():
    want = dict(np.load(GOLDEN))
    got = compute_goldens()
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], atol=2e-4, err_msg=f"golden mismatch: {k}"
        )
