"""Throughput-oriented 128px config (SURVEY.md §6 forcing function).

The flagship config's step is ~7 TFLOP/img-batch, dominated by the
full-resolution VGG; the 8k img/s/chip target needs ≤13 GFLOP/img
total. This config trades loss/encoder FLOPs for speed:

  - perceptual features at 64² (4× VGG FLOP cut) with conv blocks ≤3,
  - hourglass depth 3 (bottleneck 8² for 64² maps),
  - decoder from 32² (3 scales).

Learning still validated on synthetic via
  python tools/validate_synthetic.py --config configs/throughput128.py
Quality parity vs the flagship on real data is an open round-2 item —
bench.py's headline number stays on the flagship until then.
"""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(
            n_parts=10, img_size=128, depth=3, decoder_scales=3,
            # 3-scale pyramid must still END at 32 channels for the
            # full-res scale: the default 4-scale pyramid sliced to 3
            # left 64ch at 128² — a MORE expensive decoder than the
            # flagship's (r2 bench: 736 img/s, slower than flagship).
            decoder_features=(128, 64, 32),
        ),
        augment=AugmentConfig(),
        loss=LossConfig(
            vgg_layers=("relu1_2", "relu2_2", "relu3_2"),
            vgg_trim_blocks=3,
            vgg_resolution=64,
        ),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba",
        global_batch=1024,               # 128/chip on v5e-8
        steps=200_000,
        ckpt_dir="logs/throughput128",
    )
