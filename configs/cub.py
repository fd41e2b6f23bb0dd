"""CUB-200 birds [B:9]: articulated objects with background clutter —
heavier TPS (articulation), background channel on."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=10, img_size=128, background=True),
        augment=AugmentConfig(tps_ctrl_sd=0.14, tps_scale_sd=0.12,
                              tps_rot_sd=0.15, tps_trans_sd=0.12),
        loss=LossConfig(),
        optim=OptimConfig(lr=1e-3, decay_steps=150_000),
        dataset="cub",
        global_batch=256,
        steps=150_000,
        ckpt_dir="logs/cub",
    )
