"""Host input-pipeline feed-rate bench (VERDICT r2 missing #3).

The headline bench feeds device-resident tensors; real training
([B:8-11] large-batch DP) must DECODE its images. At the r2 bench rate
(2,818 img/s/chip) a v5e-8 host has to decode+crop+resize ~22.5k 128px
images/s. This tool measures what the host pipeline actually sustains:

  1. generates N synthetic JPEGs on disk (CelebA-like 178×218, q90),
  2. runs the native C++ decode pool (u8 path) and the Grain path
     end-to-end (batch assembly + prefetch thread included),
  3. prints one JSON line per backend: batches/s, img/s, and the ratio
     vs the device demand implied by a --demand img/s/chip × 8 chips.

No TPU needed — this is a pure host benchmark (safe to run while the
chip is busy). Results are recorded in docs/perf_ledger.md.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_images(out_dir: pathlib.Path, n: int, seed: int = 0,
                    wh: tuple = (178, 218)) -> list:
    """Synthetic JPEGs at a given source resolution: smooth
    low-frequency content (decode cost is resolution-, not content-,
    dominated; smooth content keeps file sizes in the real-photo
    range). Default 178x218 = CelebA aligned; use --src_wh to model
    DeepFashion (750x1101) or H36M (1000x1000) frames."""
    import cv2

    out_dir.mkdir(parents=True, exist_ok=True)
    paths = [out_dir / f"{i:06d}.jpg" for i in range(n)]
    if all(p.exists() for p in paths):
        return paths
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:wh[1], 0:wh[0]].astype(np.float32)
    for i, p in enumerate(paths):
        f = rng.uniform(0.01, 0.05, 6)
        ph = rng.uniform(0, 6.28, 6)
        img = np.stack(
            [
                127 + 120 * np.sin(f[2 * c] * xx + ph[2 * c])
                * np.cos(f[2 * c + 1] * yy + ph[2 * c + 1])
                for c in range(3)
            ],
            axis=-1,
        ).astype(np.uint8)
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    return paths


def bench_backend(
    dataset, backend: str, batch: int, n_batches: int, warmup: int,
    num_workers: int,
) -> dict:
    from partseg_tpu.data.loader import make_loader, prefetch

    it = prefetch(
        make_loader(
            dataset, batch, seed=0, num_workers=num_workers, backend=backend,
            process_index=0, process_count=1,
        )
    )
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b["image"].shape[1:] == (dataset.size, dataset.size, 3)
    return {
        "backend": backend,
        "dtype": str(b["image"].dtype),
        "batches_per_s": round(n_batches / dt, 2),
        "img_per_s": round(n_batches * batch / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/partseg_feed_bench")
    ap.add_argument("--n_images", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batches", type=int, default=150)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--workers", type=int, default=8,
                    help="grain read threads; native pool uses 2x this")
    ap.add_argument("--demand", type=float, default=2818.0,
                    help="device img/s/chip the pipeline must match")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--backends", default="native,grain")
    ap.add_argument("--src_wh", default="178x218",
                    help="source JPEG resolution WxH (e.g. 750x1101 for "
                         "DeepFashion-class frames)")
    ap.add_argument("--scaled_decode", default=None, choices=(None, "0", "1"),
                    help="force the native pool's N/8 DCT-scaled decode "
                         "on/off for an A/B (default: env/On)")
    args = ap.parse_args()

    from partseg_tpu.data.base import ImageListDataset

    if args.scaled_decode is not None:
        os.environ["PARTSEG_SCALED_DECODE"] = args.scaled_decode
    w, h = (int(v) for v in args.src_wh.split("x"))
    sub = pathlib.Path(args.dir) / f"{w}x{h}"
    paths = generate_images(sub, args.n_images, wh=(w, h))
    ds = ImageListDataset(paths=paths, size=args.size)
    demand = args.demand * args.chips
    for backend in args.backends.split(","):
        r = bench_backend(
            ds, backend, args.batch, args.batches, args.warmup, args.workers
        )
        cores = os.cpu_count() or 1
        r.update(
            src_wh=args.src_wh,
            scaled_decode=os.environ.get("PARTSEG_SCALED_DECODE", "1"),
            metric="host_feed_rate",
            unit="img/s/host",
            demand_img_per_s=demand,
            vs_demand=round(r["img_per_s"] / demand, 3),
            host_cores=cores,
            img_per_s_per_core=round(r["img_per_s"] / cores, 1),
            cores_needed_at_this_rate=round(demand / (r["img_per_s"] / cores), 1),
            n_images=args.n_images,
            batch=args.batch,
            workers=args.workers,
        )
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
