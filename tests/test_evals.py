"""Eval-protocol tests (SURVEY.md §4.5) + segmentation IoU sanity."""

import numpy as np

from partseg_tpu.evals.landmarks import fit_landmark_regressor, landmark_error
from partseg_tpu.evals.segmentation import match_parts_to_classes, segmentation_iou


def test_regressor_recovers_linear_relation():
    # SURVEY.md §4.5: with gt = linear(mu), the protocol reports ~0 error.
    rng = np.random.default_rng(0)
    K, L, n = 6, 5, 500
    mu = rng.uniform(-1, 1, size=(n, K, 2))
    W_true = rng.normal(size=(2 * K, 2 * L))
    gt = (mu.reshape(n, -1) @ W_true).reshape(n, L, 2)
    W = fit_landmark_regressor(mu[:400], gt[:400])
    err = landmark_error(W, mu[400:], gt[400:])
    assert err < 1e-6, err


def test_regressor_error_normalized_by_iod():
    rng = np.random.default_rng(1)
    n, K, L = 200, 4, 5
    mu = rng.uniform(-1, 1, size=(n, K, 2))
    gt = rng.uniform(-1, 1, size=(n, L, 2))
    W = fit_landmark_regressor(mu, gt)
    # Custom normalizer of 2.0 should halve the error vs normalizer 1.0.
    e1 = landmark_error(W, mu, gt, iod_fn=lambda g: np.ones(len(g)))
    e2 = landmark_error(W, mu, gt, iod_fn=lambda g: 2 * np.ones(len(g)))
    np.testing.assert_allclose(e1, 2 * e2, rtol=1e-6)


def test_segmentation_iou_perfect_and_disjoint():
    gt = np.zeros((1, 8, 8), np.int64)
    gt[0, :4, :] = 1
    m = segmentation_iou(gt, gt, n_classes=2)
    assert m["miou"] == 1.0 and m["fg_iou"] == 1.0
    pred = 1 - gt
    m2 = segmentation_iou(pred, gt, n_classes=2)
    assert m2["miou"] == 0.0 and m2["fg_iou"] == 0.0


def test_segmentation_iou_ignore_index():
    gt = np.zeros((1, 4, 4), np.int64)
    gt[0, 0, :] = 255
    pred = np.zeros((1, 4, 4), np.int64)
    m = segmentation_iou(pred, gt, n_classes=2, ignore_index=255)
    assert m["miou"] == 1.0


def test_match_parts_majority_vote():
    gt = np.zeros((1, 4, 4), np.int64)
    gt[0, :, 2:] = 3
    pred = np.zeros((1, 4, 4), np.int64)
    pred[0, :, 2:] = 1          # part 1 overlaps class 3
    mapping = match_parts_to_classes(pred, gt, n_parts=2, n_classes=4)
    assert mapping[0] == 0 and mapping[1] == 3
    remapped = mapping[pred]
    assert segmentation_iou(remapped, gt, n_classes=4)["miou"] == 1.0


def test_eval_sees_whole_split_with_remainder():
    # [B:2] protocol exactness: with drop_remainder=False + pad/trim the
    # protocol must score EVERY example (22 % 8 = 6-example tail batch).
    import jax
    import numpy as np

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.synthetic import SyntheticBlobs
    from partseg_tpu.evals.landmarks import evaluate_landmarks
    from partseg_tpu.models.partnet import PartNet, PartNetConfig

    cfg = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                        app_features=8, decoder_scales=2, use_pallas=False)
    model = PartNet(cfg)
    x = np.zeros((1, 16, 16, 3), np.float32)
    params = model.init(jax.random.key(0), x, x)
    ds = SyntheticBlobs(size=16, n_blobs=3, n_examples=22)

    def it():
        return make_loader(ds, 8, shuffle=False, num_epochs=1,
                           drop_remainder=False)

    m = evaluate_landmarks(model, params, it(), it())
    assert m["n_train"] == 22.0 and m["n_test"] == 22.0, m


def test_segmentation_eval_upsamples_predictions():
    # Predictions are NN-upsampled to the label resolution (GCPR
    # protocol: IoU at full label res), never label-downsampling —
    # remainder batches included.
    import jax
    import numpy as np

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.synthetic import SyntheticBlobs
    from partseg_tpu.evals.segmentation import evaluate_segmentation
    from partseg_tpu.models.partnet import PartNet, PartNetConfig

    cfg = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                        app_features=8, decoder_scales=2, use_pallas=False)
    model = PartNet(cfg)
    x = np.zeros((1, 16, 16, 3), np.float32)
    params = model.init(jax.random.key(0), x, x)
    ds = SyntheticBlobs(size=16, n_blobs=3, n_examples=10, with_masks=True)
    it = make_loader(ds, 4, shuffle=False, num_epochs=1, drop_remainder=False)
    m = evaluate_segmentation(model, params, it, n_classes=4)
    assert 0.0 <= m["miou"] <= 1.0 and 0.0 <= m["fg_iou"] <= 1.0


def test_nn_resize_labels_arbitrary_ratio():
    # Exact vs a naive per-pixel loop at a NON-integer ratio
    # (VERDICT r2 weak #4: 100px masks vs 64px logits must not crash).
    from partseg_tpu.evals.segmentation import nn_resize_labels

    rng = np.random.default_rng(0)
    seg = rng.integers(0, 5, size=(2, 8, 6))
    out = nn_resize_labels(seg, 13, 10)
    assert out.shape == (2, 13, 10)
    for y in range(13):
        for x in range(10):
            sy = min(int((y + 0.5) * 8 / 13), 7)
            sx = min(int((x + 0.5) * 6 / 10), 5)
            assert (out[:, y, x] == seg[:, sy, sx]).all()
    # Integer ratio reduces to repeat (the r2 behavior).
    up = nn_resize_labels(seg, 16, 12)
    np.testing.assert_array_equal(up, seg.repeat(2, axis=1).repeat(2, axis=2))


def test_segmentation_eval_noninteger_label_resolution():
    # End-to-end eval with 23px masks against the model's smaller
    # (non-divisor) logit resolution — must score, not assert-crash.
    import jax

    from partseg_tpu.data.loader import make_loader
    from partseg_tpu.data.synthetic import SyntheticBlobs
    from partseg_tpu.evals.segmentation import evaluate_segmentation, nn_resize_labels
    from partseg_tpu.models.partnet import PartNet, PartNetConfig

    cfg = PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                        app_features=8, decoder_scales=2, use_pallas=False)
    model = PartNet(cfg)
    x = np.zeros((1, 16, 16, 3), np.float32)
    params = model.init(jax.random.key(0), x, x)
    ds = SyntheticBlobs(size=16, n_blobs=3, n_examples=8, with_masks=True)

    def odd_masks(it):
        for b in it:
            b = dict(b)
            b["mask"] = nn_resize_labels(np.asarray(b["mask"]), 23, 23)
            yield b

    it = make_loader(ds, 4, shuffle=False, num_epochs=1, drop_remainder=False)
    m = evaluate_segmentation(model, params, odd_masks(it), n_classes=4)
    assert 0.0 <= m["miou"] <= 1.0 and 0.0 <= m["fg_iou"] <= 1.0
