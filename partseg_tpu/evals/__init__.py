"""L7 evaluation: landmark regression + segmentation IoU (SURVEY.md §3.3).

Mirrors the reference's eval scripts/notebooks: batched device forwards
collect soft-argmax μ; a linear regressor (Thewlis'17 protocol) maps
2K coordinates → annotated landmarks; error is % inter-ocular distance.
The GCPR'20 path computes part/foreground IoU from the per-pixel
part softmax argmax.
"""

from partseg_tpu.evals.landmarks import (
    collect_mu,
    fit_landmark_regressor,
    landmark_error,
    evaluate_landmarks,
)
from partseg_tpu.evals.segmentation import segmentation_iou

__all__ = [
    "collect_mu",
    "fit_landmark_regressor",
    "landmark_error",
    "evaluate_landmarks",
    "segmentation_iou",
]
