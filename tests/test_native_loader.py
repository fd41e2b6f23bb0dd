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
