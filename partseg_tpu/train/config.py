"""Config system: plain Python dataclasses + per-experiment config files.

Role parity: the reference's YAML-per-experiment + edflow CLI overrides
(SURVEY.md §5.6). A config file is a Python module defining
``get_config() -> TrainConfig``; CLI flags override fields dot-wise
(e.g. --set optim.lr=1e-3 model.n_parts=16).
"""

from __future__ import annotations

import dataclasses
import importlib.util
import pathlib
from typing import Any

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig


@dataclasses.dataclass(frozen=True)
class LossConfig:
    rec_weight: float = 1.0
    equiv_weight: float = 1.0
    equiv_sigma_weight: float = 1.0
    pixel_weight: float = 1.0
    vgg_layers: tuple = ("relu1_2", "relu2_2", "relu3_2", "relu4_2")
    vgg_layer_weights: tuple | None = None
    vgg_trim_blocks: int = 4          # drop conv5: ~halves loss FLOPs (SURVEY §6)
    vgg_npz: str | None = None        # pretrained weights path (or $VGG19_NPZ)
    vgg_resolution: int | None = None # downsample inputs to the VGG (perf knob)
    # Appearance-swap consistency [B:8,10]: decode with batch-rolled
    # appearance vectors and require the re-encoded part locations to
    # stay put (shape invariant under appearance transfer). Costs an
    # extra decoder+encoder pass; 0 disables.
    swap_weight: float = 0.0
    # Dense-segmentation consistency (GCPR'20 capability): cross-entropy
    # between the per-pixel part softmax and the stop-grad occupancy of
    # the rendered Gaussians (parts where a blob dominates, background
    # where none does). Ties the segmentation head to the learned
    # geometry; without it the bg channel is untrained and argmax
    # collapses to background. (Synthetic ablation: 0 → fg-IoU 0.0;
    # 0.1/max-bg → 0.18; 0.3/sum-bg → 0.29.)
    seg_weight: float = 0.3


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-3
    warmup_steps: int = 500
    decay_steps: int = 100_000
    end_lr_factor: float = 0.1
    b1: float = 0.9
    b2: float = 0.999
    weight_decay: float = 0.0
    grad_clip: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: PartNetConfig = PartNetConfig()
    augment: AugmentConfig = AugmentConfig()
    loss: LossConfig = LossConfig()
    optim: OptimConfig = OptimConfig()

    dataset: str = "synthetic"        # data/ registry name
    dataset_kwargs: tuple = ()        # sorted (key, value) pairs
    loader_backend: str = "grain"     # "grain" | "native" (C++ decode pool)
    global_batch: int = 64
    steps: int = 10_000
    # >1 trains spatially sharded: image rows split over a "space" mesh
    # axis (parallel/spatial_train.py) — the >128px path where one
    # chip's HBM cannot hold the activations. Device count must be
    # divisible by it. All losses incl. the appearance swap run sharded
    # (exactness-tested vs the unsharded step).
    space_shards: int = 1
    # >1 enables on-device data echoing (Choi et al. 2019): each host
    # batch feeds E consecutive optimizer steps, each with FRESH paired
    # TPS/color augmentation draws (keys fold state.step, which
    # advances per echo). Divides host decode demand by E — the lever
    # for input-bound hosts (docs/perf_ledger.md host-feed section).
    # The model never sees the raw batch, only augmented views, so
    # echoing re-augments rather than repeats; quality must still be
    # gated per-recipe via tools/quality_study.py before adopting E>1.
    data_echo: int = 1
    # >1 executes G consecutive fetch groups per jitted dispatch via
    # lax.scan (train/step.compose_scan): the host stacks G groups of
    # batches into ONE transfer and the device runs G*warp_every*
    # data_echo optimizer steps per dispatch. SAME STEP SEQUENCE as
    # scan_groups=1 (same batches, same per-step RNG folds — the loss
    # trajectory matches to ~1e-5; params drift at cross-executable
    # roundoff level, Adam-amplified on near-zero-gradient leaves —
    # see train/step.compose_scan); purely a dispatch/transfer-overhead lever for
    # remote-device transports (the axon tunnel serializes per-dispatch
    # round trips — docs/perf_ledger.md). steps/ckpt_every/resume
    # points must align to warp_every*data_echo*scan_groups.
    scan_groups: int = 1
    # True caches the ENTIRE dataset's images in device HBM once and
    # feeds the jitted step per-sample INDICES instead of image tensors:
    # the gather happens on-device inside the step, so the per-dispatch
    # host→device traffic drops from B·H·W·3 floats to B int32s. The
    # batch/step sequence is identical to device_data=False (the loader
    # still yields the same batches in the same order; only the image
    # transport changes), modulo cross-executable roundoff of the class
    # scan_groups documents. Levers: (a) small-dataset production runs —
    # no input pipeline at all after warmup; (b) remote/tunneled
    # transports where batch upload is the wall (the quality study: ~3 →
    # ~100+ steps/s). GRAIN BACKEND ONLY: the native C++ decode pool has
    # no per-example index plumbing (partseg_native/loader.cc returns
    # decoded pixel batches, not example ids), so loader_backend must
    # stay "grain"; requires an indexable dataset that fits in HBM
    # (both validated loudly in train()).
    device_data: bool = False
    # Store the HBM table as uint8 (floats quantized round(x*255) — the
    # identical representation a JPEG-decoding u8 host loader ships, and
    # the step's existing uint8 path normalizes it on-device): 4× the
    # dataset capacity of an f32 table. Numerics equal the u8-loader
    # path, NOT the f32 streaming path (1/255 quantization).
    device_data_u8: bool = False
    seed: int = 0

    log_every: int = 50
    image_log_every: int = 1000
    ckpt_every: int = 1000
    ckpt_dir: str = "logs/run"
    ckpt_keep: int = 3
    profile_steps: tuple | None = None  # (start, stop) step range to trace
    fault_injection_step: int | None = None  # kill process at this step (CI resume test)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def load_config(path: str) -> TrainConfig:
    """Load ``get_config()`` from a Python config file."""
    p = pathlib.Path(path)
    spec = importlib.util.spec_from_file_location(p.stem, p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def apply_overrides(cfg: Any, overrides: list[str]) -> Any:
    """Apply dot-path overrides like ``optim.lr=3e-4`` to nested frozen
    dataclasses (the CLI-override half of the edflow parity)."""
    import ast

    for ov in overrides:
        key, _, raw = ov.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        parts = key.strip().split(".")
        cfg = _set_nested(cfg, parts, value)
    return cfg


def _set_nested(obj: Any, parts: list[str], value: Any) -> Any:
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _set_nested(child, parts[1:], value)})
