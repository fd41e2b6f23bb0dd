"""Human3.6M / Penn Action video frames [B:11]: large-batch
data-parallel training on v5e-8 (swap dataset="penn_action" via
--set dataset=penn_action for the Penn variant)."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=16, img_size=128),
        augment=AugmentConfig(tps_ctrl_sd=0.12, tps_rot_sd=0.12),
        loss=LossConfig(),
        optim=OptimConfig(lr=1.5e-3, decay_steps=300_000),
        dataset="human36m",
        global_batch=512,             # 64/chip on v5e-8: the large-batch DP config
        steps=300_000,
        ckpt_dir="logs/human36m",
    )
