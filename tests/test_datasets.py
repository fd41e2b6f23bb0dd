"""Fixture-based tests for the real-image dataset loaders: build tiny
fake on-disk dataset trees, then exercise the exact parsing/crop/
landmark-mapping paths (no real downloads exist in this environment)."""

import pathlib

import numpy as np
import pytest

import partseg_tpu.data  # noqa: F401  (registers datasets)
from partseg_tpu.data.base import crop_resize
from partseg_tpu.data.registry import build_dataset


def _write_img(path: pathlib.Path, h=40, w=30, seed=0):
    import cv2

    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    cv2.imwrite(str(path), img)


def test_crop_resize_landmark_mapping():
    img = np.zeros((40, 30, 3), np.float32)
    # landmark at pixel (x=15, y=20) — the image center.
    lms = np.array([[15.0, 20.0]], np.float32)
    out, lm = crop_resize(img, 16, bbox=None, landmarks=lms)
    assert out.shape == (16, 16, 3)
    # center pixel maps to ~0 in normalized coords
    assert np.abs(lm).max() < 0.05


def test_celeba_fixture(tmp_path, monkeypatch):
    root = tmp_path / "celeba"
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for i, n in enumerate(names):
        _write_img(root / "img_align_celeba" / n, seed=i)
    lm_lines = ["6", "lefteye_x lefteye_y ..."]
    for n in names:
        lm_lines.append(n + " 10 12 20 12 15 18 12 25 18 25")
    (root / "list_landmarks_align_celeba.txt").write_text("\n".join(lm_lines))
    (root / "mafl_training.txt").write_text("\n".join(names[:4]))
    (root / "mafl_testing.txt").write_text("\n".join(names[4:]))
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))

    tr = build_dataset("celeba", split="train", size=32)
    te = build_dataset("celeba", split="test", size=32)
    un = build_dataset("celeba", split="unsup", size=32)
    assert len(tr) == 4 and len(te) == 2 and len(un) == 4
    ex = tr[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["landmarks"].shape == (5, 2)
    assert np.abs(ex["landmarks"]).max() <= 1.0
    assert 0.0 <= ex["image"].min() and ex["image"].max() <= 1.0


def test_cub_fixture(tmp_path, monkeypatch):
    root = tmp_path / "CUB_200_2011"
    (root / "parts").mkdir(parents=True)
    ids = ["1", "2", "3"]
    rel = {i: f"001.Bird/img_{i}.jpg" for i in ids}
    for i in ids:
        _write_img(root / "images" / rel[i], h=50, w=60, seed=int(i))
    (root / "images.txt").write_text("\n".join(f"{i} {rel[i]}" for i in ids))
    (root / "train_test_split.txt").write_text("1 1\n2 1\n3 0")
    (root / "bounding_boxes.txt").write_text(
        "1 5 5 40 30\n2 10 10 30 30\n3 0 0 50 40"
    )
    locs = []
    for i in ids:
        for p in range(1, 16):
            locs.append(f"{i} {p} 20 20 {1 if p <= 3 else 0}")
    (root / "parts" / "part_locs.txt").write_text("\n".join(locs))
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))

    tr = build_dataset("cub", split="train", size=24)
    te = build_dataset("cub", split="test", size=24)
    assert len(tr) == 2 and len(te) == 1
    ex = tr[0]
    assert ex["image"].shape == (24, 24, 3)
    assert ex["landmarks"].shape == (15, 2)
    assert np.isfinite(ex["landmarks"][:3]).all()
    assert np.isnan(ex["landmarks"][3:]).all()


def test_deepfashion_fixture(tmp_path, monkeypatch):
    root = tmp_path / "deepfashion"
    names = [f"img/Sub/{i:03d}.jpg" for i in range(4)]
    for i, n in enumerate(names):
        _write_img(root / "Img" / n, seed=i)
    (root / "Eval").mkdir(parents=True)
    lines = ["4", "image_name evaluation_status"]
    status = ["train", "train", "gallery", "query"]
    for n, s in zip(names, status):
        lines.append(f"{n} item_id {s}" if False else f"{n} {s}")
    (root / "Eval" / "list_eval_partition.txt").write_text("\n".join(lines))
    (root / "Anno").mkdir(parents=True)
    anno = ["4", "image_name clothes_type variation_type landmarks"]
    for n in names:
        anno.append(n + " 1 1 " + " ".join(["0 10 15"] * 4))
    (root / "Anno" / "list_landmarks_inshop.txt").write_text("\n".join(anno))
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))

    tr = build_dataset("deepfashion", split="train", size=16)
    te = build_dataset("deepfashion", split="test", size=16)
    assert len(tr) == 2 and len(te) == 1
    ex = tr[0]
    assert ex["image"].shape == (16, 16, 3)
    assert np.isfinite(ex["landmarks"][:4]).all()
    assert np.isnan(ex["landmarks"][4:]).all()


def test_penn_action_fixture(tmp_path, monkeypatch):
    root = tmp_path / "penn_action"
    for seq, train in [("0001", 1), ("0002", 0)]:
        for t in range(1, 4):
            _write_img(root / "frames" / seq / f"{t:06d}.jpg", seed=t)
        (root / "labels").mkdir(parents=True, exist_ok=True)
        np.savez(
            root / "labels" / f"{seq}.npz",
            x=np.full((3, 13), 10.0),
            y=np.full((3, 13), 12.0),
            visibility=np.ones((3, 13), bool),
            train=np.array([train]),
        )
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))

    tr = build_dataset("penn_action", split="train", size=16, stride=1)
    te = build_dataset("penn_action", split="test", size=16, stride=1)
    assert len(tr) == 3 and len(te) == 3
    ex = tr[0]
    assert ex["image"].shape == (16, 16, 3)
    assert ex["landmarks"].shape == (13, 2)


def test_human36m_fixture(tmp_path, monkeypatch):
    root = tmp_path / "human36m" / "frames"
    for subj in ["S1", "S9"]:
        for t in range(1, 4):
            _write_img(root / subj / "Walking" / f"{t:06d}.jpg", seed=t)
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))
    tr = build_dataset("human36m", split="train", size=16, stride=1)
    te = build_dataset("human36m", split="test", size=16, stride=1)
    assert len(tr) == 3 and len(te) == 3
    assert tr[0]["image"].shape == (16, 16, 3)


def test_missing_data_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path / "nothing"))
    with pytest.raises(FileNotFoundError):
        build_dataset("celeba", split="train", size=16)[0]


def test_check_data_pass_and_fail(tmp_path, monkeypatch, capsys):
    # docs/real_data.md pre-flight: PASS on a valid fixture tree, FAIL
    # (with the failing split named) on an empty mount.
    from partseg_tpu.data.check import check_data

    root = tmp_path / "celeba"
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for i, n in enumerate(names):
        _write_img(root / "img_align_celeba" / n, seed=i)
    lm_lines = ["6", "hdr"]
    for n in names:
        lm_lines.append(n + " 10 12 20 12 15 18 12 25 18 25")
    (root / "list_landmarks_align_celeba.txt").write_text("\n".join(lm_lines))
    (root / "mafl_training.txt").write_text("\n".join(names[:4]))
    (root / "mafl_testing.txt").write_text("\n".join(names[4:]))
    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path))

    assert check_data("celeba", {"size": 32}) is True
    out = capsys.readouterr().out
    assert "PASS unsup" in out and "VGG19 weights:" in out

    monkeypatch.setenv("PARTSEG_DATA", str(tmp_path / "empty"))
    assert check_data("celeba", {"size": 32}) is False
    assert "FAIL" in capsys.readouterr().out
