"""Prefetcher and synthetic-mask tests."""

import numpy as np

from partseg_tpu.data.loader import make_loader, prefetch
from partseg_tpu.data.synthetic import SyntheticBlobs


def test_prefetch_preserves_stream():
    ds = SyntheticBlobs(size=8, n_blobs=2, n_examples=16)
    plain = list(make_loader(ds, 4, shuffle=False, num_epochs=1))
    fetched = list(prefetch(make_loader(ds, 4, shuffle=False, num_epochs=1)))
    assert len(plain) == len(fetched) == 4
    for a, b in zip(plain, fetched):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_synthetic_masks():
    ds = SyntheticBlobs(size=32, n_blobs=3, n_examples=4, with_masks=True)
    ex = ds[0]
    m = ex["mask"]
    assert m.shape == (32, 32) and m.dtype == np.int32
    assert m.min() == 0 and 1 <= m.max() <= 3
    # Each blob center pixel is labeled with its own part.
    for i, (y, x) in enumerate(ex["landmarks"]):
        iy = int((y + 1) / 2 * 32)
        ix = int((x + 1) / 2 * 32)
        if 0 <= iy < 32 and 0 <= ix < 32:
            assert m[iy, ix] == i + 1, (i, m[iy, ix])
