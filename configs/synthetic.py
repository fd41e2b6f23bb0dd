"""Synthetic-blobs smoke config (SURVEY.md §7.3 minimum end-to-end slice)."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(
            n_parts=5, img_size=64, features=64, depth=3,
            app_features=64, decoder_scales=3,
        ),
        augment=AugmentConfig(),
        loss=LossConfig(vgg_trim_blocks=3, vgg_layers=("relu1_2", "relu2_2", "relu3_2")),
        optim=OptimConfig(lr=1e-3, warmup_steps=100, decay_steps=5_000),
        dataset="synthetic",
        dataset_kwargs=(("size", 64), ("n_blobs", 5)),
        global_batch=32,
        steps=2_000,
        ckpt_dir="logs/synthetic",
    )
