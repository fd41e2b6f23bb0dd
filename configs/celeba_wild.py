"""CelebA-in-the-wild 10-part model [B:7]: the released-checkpoint
config whose eval mode runs single-batch 128px CPU inference (part
heatmaps + soft-argmax landmarks) via partseg_tpu.evals.infer --cpu."""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(n_parts=10, img_size=128),
        # Wild faces: stronger geometric variation than aligned CelebA.
        augment=AugmentConfig(tps_scale_sd=0.12, tps_rot_sd=0.12,
                              tps_trans_sd=0.12, tps_ctrl_sd=0.10),
        loss=LossConfig(),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba_wild",
        global_batch=256,
        steps=200_000,
        ckpt_dir="logs/celeba_wild",
    )
