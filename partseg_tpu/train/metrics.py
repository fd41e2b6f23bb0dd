"""Metrics / logging / observability (SURVEY.md §5.5).

Replaces edflow's LoggingHook: scalar metrics go to stdout as JSON
lines + a metrics.jsonl in the run dir; TensorBoard summaries are
written when TF is importable (it is in this image); throughput
(img/s/chip) is measured and logged — the headline metric [B:2].
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Any, Mapping


class MetricLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self._dir = pathlib.Path(run_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self._dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: deferred heavy import

                self._tb = tf.summary.create_file_writer(str(self._dir / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Mapping[str, Any]) -> None:
        # Strings (e.g. vgg_mode provenance) go to the JSONL record but
        # not to TensorBoard scalars.
        scalars = {
            k: float(v) for k, v in metrics.items() if not isinstance(v, str)
        }
        tags = {k: v for k, v in metrics.items() if isinstance(v, str)}
        rec = {"step": int(step), "time": time.time(), **scalars, **tags}
        line = json.dumps(rec)
        print(line, flush=True)
        self._jsonl.write(line + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)

    def log_images(self, step: int, images: Mapping[str, Any]) -> None:
        """Image grids (recon, part overlays) — PNGs in the run dir +
        TensorBoard when available."""
        import numpy as np

        img_dir = self._dir / "images"
        img_dir.mkdir(exist_ok=True)
        for name, arr in images.items():
            a = np.asarray(arr)
            a8 = (np.clip(a, 0, 1) * 255).astype("uint8")
            try:
                import cv2

                grid = _to_grid(a8)
                cv2.imwrite(
                    str(img_dir / f"{name}_{step:07d}.png"), grid[..., ::-1]
                )
            except Exception:
                pass
            if self._tb is not None:
                import tensorflow as tf

                with self._tb.as_default():
                    tf.summary.image(name, a8, step=step, max_outputs=4)

    def close(self):
        self._jsonl.close()


def _to_grid(batch):
    """[B,H,W,C] uint8 → single row-grid image."""
    import numpy as np

    b, h, w, c = batch.shape
    n = min(b, 8)
    return np.concatenate([batch[i] for i in range(n)], axis=1)
