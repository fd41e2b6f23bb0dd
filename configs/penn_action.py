"""Penn Action video frames [B:11]: large-batch data-parallel training
on v5e-8. Same recipe family as configs/human36m.py (the two video
datasets share hyperparameters in the reference's config matrix);
frames are extracted with tools/convert_penn_action.py into
$PARTSEG_DATA/penn_action (layout in docs/real_data.md)."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=16, img_size=128),
        augment=AugmentConfig(tps_ctrl_sd=0.12, tps_rot_sd=0.12),
        loss=LossConfig(),
        optim=OptimConfig(lr=1.5e-3, decay_steps=300_000),
        dataset="penn_action",
        global_batch=512,             # 64/chip on v5e-8: large-batch DP
        steps=300_000,
        ckpt_dir="logs/penn_action",
    )
