"""Speed-oriented 128px config — the bandwidth roofline vehicle.

r2 tracing showed the step is HBM-BANDWIDTH-bound, not FLOP-bound
(most fusions run at ~700 GB/s ≈ v5e peak while the MXU idles): the
128-channel trunk moves ~[2B,64,64,128]=268 MB per activation. The 8k
img/s/chip target (16 ms/step at B=128) allows ≈13 GB of HBM traffic
per step, so this config halves every activation the throughput128
config still carries:

  - trunk features 48 (100 MB per 2B activation), hourglass depth 3,
  - appearance dim 48,
  - decoder pyramid (96, 48, 24) over 3 scales with per-scale
    appearance projection,
  - perceptual features at 64² over VGG blocks ≤2.

Learning validated on synthetic at EVERY slimming step
(tools/validate_synthetic.py, 800 on-chip steps, landmark %-diag vs
the flagship recipe's 0.58–0.71 band at equal steps):

  features 64 (2,486 img/s/chip): 0.634  (logs/val_speed)
  features 48 (2,818 img/s/chip): 0.766  (logs/val_f48) — inside the
    documented 2× gate of tools/quality_study.py; the 64-ch rung is
    one `--set model.features=64 model.app_features=64` away.

Accuracy headroom vs the flagship is bounded by quality_study-style
equal-step comparisons — quality configs (configs/celeba.py) keep the
full trunk + full VGG.
"""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(
            n_parts=10, img_size=128, features=48, app_features=48,
            depth=3, decoder_scales=3, decoder_features=(96, 48, 24),
        ),
        augment=AugmentConfig(),
        loss=LossConfig(
            vgg_layers=("relu1_2", "relu2_2"),
            vgg_trim_blocks=2,
            vgg_resolution=64,
        ),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba",
        global_batch=1024,               # 128/chip on v5e-8
        steps=200_000,
        ckpt_dir="logs/speed128",
    )
