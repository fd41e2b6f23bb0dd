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


def test_scaled_decode_matches_full(tmp_path):
    # N/8 DCT-scaled JPEG decode must agree with the full-resolution
    # decode path to JPEG-class tolerance, for both center and explicit
    # bbox crops (bbox coords are given in FULL-res pixels and mapped
    # onto the scaled frame inside the pool).
    from partseg_tpu.data.native import NativePool

    yy, xx = np.mgrid[0:218, 0:178].astype(np.float32)
    img = np.stack(
        [127 + 100 * np.sin(0.03 * xx), 127 + 100 * np.cos(0.02 * yy),
         127 + 80 * np.sin(0.02 * (xx + yy))], -1
    ).astype(np.uint8)
    small = tmp_path / "small.jpg"
    cv2.imwrite(str(small), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    big = tmp_path / "big.jpg"
    cv2.imwrite(str(big), cv2.resize(img, (1280, 720)),
                [cv2.IMWRITE_JPEG_QUALITY, 95])

    def load(scaled, bboxes=None):
        with NativePool(out_size=96, n_threads=2, scaled_decode=scaled) as p:
            return p.load_batch([small, big], bboxes=bboxes)

    center_err = np.abs(load(True) - load(False)).max()
    assert center_err < 0.04, center_err
    boxes = [(10, 30, 150, 150), (300, 100, 400, 400)]
    bbox_err = np.abs(load(True, boxes) - load(False, boxes)).max()
    assert bbox_err < 0.04, bbox_err


@pytest.fixture(scope="module")
def color_images(tmp_path_factory):
    # 7 constant-color PNGs: a batch's rounded mean identifies the
    # selected index regardless of resize/interp differences between
    # the native and Grain decode paths.
    tmp = tmp_path_factory.mktemp("colors")
    for i in range(7):
        img = np.full((20, 20, 3), i * 30, np.uint8)
        cv2.imwrite(str(tmp / f"{i}.png"), img)
    return [tmp / f"{i}.png" for i in range(7)]


def _batch_ids(img_batch):
    x = np.asarray(img_batch, np.float32)
    if x.dtype != np.uint8 and x.max() <= 1.0:
        x = x * 255.0
    return [int(round(v / 30.0)) for v in x.mean(axis=(1, 2, 3))]


def test_native_batch_numbering_matches_grain_nondivisible(color_images):
    # VERDICT r2 weak #6: on a NON-divisible split (7 examples, batch 3)
    # both backends must cut batch #N from stream positions
    # [3N, 3N+3) of the repeated stream — the epoch remainder carries
    # into the next batch, never dropped.
    from partseg_tpu.data.base import ImageListDataset
    from partseg_tpu.data.loader import make_loader

    ds = ImageListDataset(paths=color_images, size=16)
    native = make_loader(ds, 3, shuffle=False, backend="native",
                         num_workers=2, process_index=0, process_count=1)
    gr = make_loader(ds, 3, shuffle=False, backend="grain",
                     process_index=0, process_count=1)
    for _ in range(6):
        assert _batch_ids(next(native)["image"]) == _batch_ids(next(gr)["image"])


def test_native_seek_exact_on_nondivisible_split(color_images):
    # Seek arithmetic under the continuous-stream numbering, shuffled:
    # batch 5 of a 7-example/batch-3 stream sits mid-epoch-2 after two
    # remainder carries; resume must reproduce it bit-exactly.
    from partseg_tpu.data.base import ImageListDataset
    from partseg_tpu.data.native import native_loader

    ds = ImageListDataset(paths=color_images, size=16)
    full = [
        b["image"]
        for b, _ in zip(
            native_loader(ds, batch_size=3, seed=9, num_threads=2), range(9)
        )
    ]
    res = [
        b["image"]
        for b, _ in zip(
            native_loader(ds, batch_size=3, seed=9, num_threads=2,
                          start_batch=5),
            range(4),
        )
    ]
    for a, b in zip(full[5:], res):
        np.testing.assert_array_equal(a, b)


def test_grain_seek_exact_on_nondivisible_split(color_images):
    from partseg_tpu.data.base import ImageListDataset
    from partseg_tpu.data.loader import make_loader

    ds = ImageListDataset(paths=color_images, size=16)
    full = [
        b["image"]
        for b, _ in zip(
            make_loader(ds, 3, seed=9, process_index=0, process_count=1),
            range(9),
        )
    ]
    res = [
        b["image"]
        for b, _ in zip(
            make_loader(ds, 3, seed=9, start_batch=5,
                        process_index=0, process_count=1),
            range(4),
        )
    ]
    for a, b in zip(full[5:], res):
        np.testing.assert_array_equal(a, b)
