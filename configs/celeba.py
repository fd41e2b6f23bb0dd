"""CelebA 128px training config [B:8]: TPS-equivariance +
appearance-swap reconstruction, K=10 parts."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=10, img_size=128),
        augment=AugmentConfig(),
        loss=LossConfig(swap_weight=0.5),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba",
        global_batch=256,             # 32/chip on v5e-8
        steps=200_000,
        ckpt_dir="logs/celeba",
    )
