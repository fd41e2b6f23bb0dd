"""L4 losses: VGG19 perceptual reconstruction + TPS equivariance.

Role parity: SURVEY.md §2.1 "VGG19 perceptual loss" and "Equivariance
loss" [B:5,8][PAPER].
"""

from partseg_tpu.losses.vgg import VGG19Features, load_vgg19_npz, random_vgg19_params
from partseg_tpu.losses.perceptual import PerceptualLoss
from partseg_tpu.losses.equivariance import equivariance_loss

__all__ = [
    "VGG19Features",
    "load_vgg19_npz",
    "random_vgg19_params",
    "PerceptualLoss",
    "equivariance_loss",
]
