"""CelebA 256px spatially-sharded training config (SURVEY.md §5.7).

The >128px scaling path: at 256px the flagship activations are 4× the
128px ones per image — [2B, 128, 128, 128] trunk tensors alone are
~1 GB at B=128 — so one chip's HBM cannot hold a competitive batch.
This config trains with image ROWS sharded over a "space" mesh axis
(space_shards=2 → a v5e-8 runs 4-way data-parallel × 2-way spatial):
halo-exchange convs, psum GroupNorm/softmax/moments/pooling, row-local
rendering — the full step is exactness-tested against the unsharded
one (tests/test_spatial_sharding.py::test_spatial_train_step_*).

Requires: device count divisible by space_shards. All loss terms are
supported (incl. the appearance-swap round, which rolls per data
shard exactly like the DP branch). The driver
dry-runs this path via __graft_entry__.dryrun_multichip (spatial
phase). Launch:

    python -m partseg_tpu.train.cli --config configs/celeba256_spatial.py
"""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(
            n_parts=10, img_size=256, features=128, depth=4,
            app_features=128, decoder_scales=4,
        ),
        augment=AugmentConfig(),
        loss=LossConfig(vgg_resolution=128, swap_weight=0.5),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba",
        dataset_kwargs=(("size", 256),),
        global_batch=128,                 # 32 per data shard on v5e-8
        space_shards=2,
        steps=200_000,
        ckpt_dir="logs/celeba256",
    )
