"""DeepFashion full-body 16-part model + appearance-transfer
reconstruction [B:10]."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=16, img_size=128),
        augment=AugmentConfig(tps_ctrl_sd=0.12),
        loss=LossConfig(swap_weight=1.0),   # appearance transfer is the point
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="deepfashion",
        global_batch=256,
        steps=200_000,
        ckpt_dir="logs/deepfashion",
    )
