"""Native C++ decode-pool tests (builds the .so on demand with g++)."""

import pathlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pool():
    from partseg_tpu.data.native import NativePool

    with NativePool(out_size=24, n_threads=4) as p:
        yield p


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    # Smooth gradient: JPEG-faithful (noise images distort heavily even
    # at q98 due to chroma subsampling).
    yy, xx = np.mgrid[0:40, 0:60]
    img = np.stack([yy * 6, xx * 4, (yy + xx) * 2], axis=-1).astype(np.uint8)
    cv2.imwrite(str(tmp / "a.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 98])
    cv2.imwrite(str(tmp / "b.png"), img)
    return tmp, img


def test_decode_matches_cv2(pool, images):
    tmp, img = images
    batch = pool.load_batch([tmp / "a.jpg", tmp / "b.png"])
    assert batch.shape == (2, 24, 24, 3)
    # Reference: center square crop (cols 10..50) + bilinear resize.
    ref = (
        cv2.resize(img[:, 10:50][..., ::-1], (24, 24),
                   interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255.0
    )
    assert np.abs(batch[1] - ref).max() < 0.08       # png lossless path
    assert np.abs(batch[0] - ref).max() < 0.15       # jpeg lossy path


def test_bbox_crop(pool, images):
    tmp, img = images
    batch = pool.load_batch([tmp / "b.png"], bboxes=[(20, 10, 20, 20)])
    ref = (
        cv2.resize(img[10:30, 20:40][..., ::-1], (24, 24),
                   interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255.0
    )
    assert np.abs(batch[0] - ref).max() < 0.08


def test_missing_and_corrupt_files_give_zeros(pool, images, tmp_path):
    tmp, _ = images
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"\xff\xd8not a real jpeg")
    batch = pool.load_batch([tmp / "missing.jpg", bad, tmp / "b.png"])
    assert batch[0].max() == 0.0
    assert batch[1].max() == 0.0
    assert batch[2].max() > 0.0


def test_native_loader_iterator(images):
    from partseg_tpu.data.base import ImageListDataset
    from partseg_tpu.data.native import native_loader

    tmp, _ = images
    ds = ImageListDataset(paths=[tmp / "a.jpg", tmp / "b.png"] * 4, size=16)
    it = native_loader(ds, batch_size=4, shuffle=False, num_threads=2)
    b1 = next(it)
    b2 = next(it)
    assert b1["image"].shape == (4, 16, 16, 3)
    assert b2["image"].shape == (4, 16, 16, 3)


def test_native_loader_start_batch_seeks_exactly(images):
    # SURVEY.md §5.4: start_batch seek reproduces the uninterrupted
    # sequence exactly, including across the epoch boundary (3
    # batches/epoch here, seek to batch 4 = epoch 1 batch 1).
    from partseg_tpu.data.base import ImageListDataset
    from partseg_tpu.data.native import native_loader

    tmp, _ = images
    ds = ImageListDataset(paths=[tmp / "a.jpg", tmp / "b.png"] * 3, size=16)
    full = [
        b["image"]
        for b, _ in zip(
            native_loader(ds, batch_size=2, seed=5, num_threads=2), range(7)
        )
    ]
    res = [
        b["image"]
        for b, _ in zip(
            native_loader(ds, batch_size=2, seed=5, num_threads=2,
                          start_batch=4),
            range(3),
        )
    ]
    for a, b in zip(full[4:], res):
        np.testing.assert_array_equal(a, b)


def test_u8_output_matches_f32(pool, images):
    # The uint8 training path must be the same pixels as the f32 path
    # (f32 is just u8 * 1/255 — decode/crop/resize all happen in u8).
    tmp, _ = images
    b8 = pool.load_batch([tmp / "b.png"], dtype="u8")
    bf = pool.load_batch([tmp / "b.png"], dtype="f32")
    assert b8.dtype == np.uint8 and bf.dtype == np.float32
    np.testing.assert_allclose(b8.astype(np.float32) / 255.0, bf, atol=1e-6)
