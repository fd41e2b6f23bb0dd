"""Export torchvision's pretrained VGG19 to the npz layout
partseg_tpu.losses.vgg expects (conv{b}_{i}/kernel HWIO + /bias).

Run wherever torchvision + network access exist (NOT this offline
image), then point $VGG19_NPZ (or loss.vgg_npz) at the file:

    python tools/export_vgg19.py vgg19.npz
"""

import sys

import numpy as np

# VGG19 feature-extractor conv layout: torchvision indices → names.
_NAMES = [
    "conv1_1", "conv1_2",
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]


def main(out_path: str) -> None:
    import torch
    from torchvision.models import VGG19_Weights, vgg19

    model = vgg19(weights=VGG19_Weights.IMAGENET1K_V1).features.eval()
    convs = [m for m in model if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == len(_NAMES), len(convs)
    arrays = {}
    for name, conv in zip(_NAMES, convs):
        # torch OIHW → flax HWIO.
        arrays[f"{name}/kernel"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).astype(np.float32)
        )
        arrays[f"{name}/bias"] = conv.bias.detach().numpy().astype(np.float32)
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "vgg19.npz")
