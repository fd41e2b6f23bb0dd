"""L5 data pipelines.

One interface for all datasets (SURVEY.md §2.1 "Dataset loaders"):
a `Dataset` yields dict examples {"image": [H,W,3] float32 in [0,1],
optional "landmarks": [L,2] normalized (y,x)}; `make_loader` wraps it
into per-host-sharded batched iteration (Grain-backed for real data,
pure-jax for synthetic).
"""

from partseg_tpu.data.synthetic import SyntheticBlobs
from partseg_tpu.data.loader import make_loader
from partseg_tpu.data.registry import build_dataset

# Import dataset modules for their @register side effects.
from partseg_tpu.data import celeba as _celeba    # noqa: F401
from partseg_tpu.data import cub as _cub          # noqa: F401
from partseg_tpu.data import deepfashion as _df   # noqa: F401
from partseg_tpu.data import video as _video      # noqa: F401

__all__ = ["SyntheticBlobs", "make_loader", "build_dataset"]
