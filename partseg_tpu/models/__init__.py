"""L3 models: hourglass shape/appearance encoders + image decoder (Flax).

Role parity: SURVEY.md §2.1 "Hourglass shape encoder", "Appearance
encoder", "Image decoder" [B:5][PAPER]. TPU-first choices: NHWC layout,
bf16 compute with f32 params (moment/covariance math stays f32 inside
partops), GroupNorm instead of BatchNorm (no cross-device stat sync
needed under data parallelism), static shapes throughout.
"""

from partseg_tpu.models.blocks import ConvBlock, ResBlock
from partseg_tpu.models.hourglass import Hourglass
from partseg_tpu.models.encoders import ShapeEncoder, AppearanceEncoder
from partseg_tpu.models.decoder import Decoder
from partseg_tpu.models.partnet import PartNet, PartNetConfig, PartNetOutputs

__all__ = [
    "ConvBlock",
    "ResBlock",
    "Hourglass",
    "ShapeEncoder",
    "AppearanceEncoder",
    "Decoder",
    "PartNet",
    "PartNetConfig",
    "PartNetOutputs",
]
