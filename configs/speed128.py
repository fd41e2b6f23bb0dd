"""Speed-oriented 128px config — the bandwidth-roofline vehicle.

r2/r3 tracing showed the step is HBM-BANDWIDTH-bound, not FLOP-bound
(fusions run at ~700 GB/s ≈ v5e peak while the MXU idles). The 8k
img/s/chip target (16 ms/step at B=128) allows ≈13 GB of HBM traffic
per step. The rungs, each measured on chip (docs/perf_ledger.md):

  r2 base: 48-ch trunk, hourglass depth 3, appearance 48, decoder
    pyramid (96, 48, 24)/3 scales, VGG ≤relu2_2 @64²  → 2,806
  + decoder_out_size=64 (decode AT the loss resolution: the 128²
    decoder scale fed only a pixel-L1 nothing else consumed; the
    fully-conv decoder re-renders at any out_size for inference —
    evals/transfer.py resets it to None automatically)  → 4,304
  + stem_stride=4 (4×4 space-to-depth stem; the whole trunk runs at
    32², quartering its bytes; part maps at 32²)        → 7,322
  + warp_every=2 (TPS warp on even steps only, whole period compiled
    as ONE unrolled two-sub-step program — train/step.py)  → 9,307
  + VGG ≤relu1_2 only (the loss reads 4× fewer feature
    bytes)                                              → 11,004
  + scan_groups=8 (lax.scan over 8 stacked fetch groups per dispatch
    — same step sequence/data stream, roundoff-level cross-executable
    drift only (train/step.compose_scan); amortizes the per-dispatch
    host round trip that remote transports serialize)   → 11,783
  r5: + decoder_out_size=32 / vgg_resolution=32 (decode AND take the
    loss at the 32² part-map resolution — only reconstruction detail
    drops; seg/equivariance paths untouched) composed with
    + warp_fraction=0.5 (warp only the first B/2 samples of each
    warp-on sub-step; the warp custom call and its layout copies
    halve, while every warp-on step keeps true-warp equivariance
    pairs — augment/pair.py)                            → 22,038
    + warp_fraction=0.25 (quarter-batch warp; same no-cadence-cut
    lever, half again the warp cost)                    → 24,780

Quality gating: tools/quality_study.py --px 128 trains the ACTUAL
recipes (this config vs configs/celeba.py's flagship) at equal
WALL-CLOCK with step budgets scaled by measured throughput; the bench
default must match the flagship's landmark error and mIoU there. The
r5 gate run (logs/quality_study_r5/result.json, committed): this
recipe at equal wall-clock BEATS the flagship on landmark error
(2-seed mean 0.482 vs 0.697 %-diag) AND mIoU (0.3036 vs 0.2543) —
the strongest row of any rung — with BOTH seeds passing individually
(seed_rows/seed_spread in the same result.json). The wf50 half-batch
rung passed identically (0.515 / 0.3065 at 2 seeds) — warp_fraction
degrades gracefully because every warp-on step keeps true-warp
equivariance pairs. Quality configs
(configs/celeba.py) keep the full trunk, full VGG, full-res decoding,
and per-step full-batch warps.

Note warp_fraction<1 is distribution-identical but not bitwise
sharding-invariant (WHICH samples warp depends on the shard split —
augment/pair.py sharding note + the cross-topology test); every other
knob here is topology-exact.
"""

from partseg_tpu.augment.pair import AugmentConfig
from partseg_tpu.models.partnet import PartNetConfig
from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig


def get_config() -> TrainConfig:
    return TrainConfig(
        model=PartNetConfig(
            n_parts=10, img_size=128, features=48, app_features=48,
            depth=3, decoder_scales=3, decoder_features=(96, 48, 24),
            decoder_out_size=32, stem_stride=4,
        ),
        augment=AugmentConfig(warp_every=2, warp_fraction=0.25),
        loss=LossConfig(
            vgg_layers=("relu1_2",),
            vgg_trim_blocks=1,
            vgg_resolution=32,
        ),
        optim=OptimConfig(lr=1e-3, decay_steps=200_000),
        dataset="celeba",
        global_batch=1024,               # 128/chip on v5e-8
        steps=200_000,
        # One dispatch = warp_every*scan_groups = 16 steps (same step
        # sequence as 16 single dispatches, roundoff-level drift only —
        # train/step.compose_scan); steps/ckpt_every/resume points must
        # align to that span.
        scan_groups=8,
        ckpt_every=1600,
        ckpt_dir="logs/speed128",
    )
