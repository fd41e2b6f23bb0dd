"""Part-segmentation IoU eval (GCPR'20 path, SURVEY.md §2.1).

argmax over the per-pixel part softmax → dense part segmentation;
IoU per part + mIoU vs annotations; foreground IoU treats the union of
the K parts as foreground (background channel = class 0 when present).
"""

from __future__ import annotations

import numpy as np


def segmentation_iou(
    pred: np.ndarray,
    gt: np.ndarray,
    n_classes: int,
    ignore_index: int | None = None,
) -> dict[str, float]:
    """IoU metrics from label maps.

    Args:
      pred, gt: [N, H, W] integer label maps (0 = background).
      n_classes: number of classes incl. background.
      ignore_index: gt label to exclude from all metrics.

    Returns {"miou", "fg_iou", "iou_<c>"...}.
    """
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    valid = np.ones_like(gt, bool) if ignore_index is None else gt != ignore_index

    ious = {}
    per_class = []
    for c in range(n_classes):
        p = (pred == c) & valid
        g = (gt == c) & valid
        inter = np.logical_and(p, g).sum()
        union = np.logical_or(p, g).sum()
        if union > 0:
            iou = inter / union
            ious[f"iou_{c}"] = float(iou)
            per_class.append(iou)
    ious["miou"] = float(np.mean(per_class)) if per_class else 0.0

    pf = (pred != 0) & valid
    gf = (gt != 0) & valid
    union = np.logical_or(pf, gf).sum()
    ious["fg_iou"] = float(np.logical_and(pf, gf).sum() / union) if union else 0.0
    return ious


def match_parts_to_classes(
    pred_parts: np.ndarray, gt: np.ndarray, n_parts: int, n_classes: int
) -> np.ndarray:
    """Majority-vote assignment of unsupervised parts → annotated classes
    (needed because discovered parts are unordered). Returns mapping [n_parts+1]
    with background fixed to 0; apply as mapping[pred_label_map]."""
    mapping = np.zeros(n_parts + 1, np.int64)
    for k in range(1, n_parts + 1):
        mask = pred_parts == k
        if mask.sum() == 0:
            continue
        votes = np.bincount(gt[mask].reshape(-1), minlength=n_classes)
        mapping[k] = int(np.argmax(votes))
    return mapping
