"""Quality-vs-speed study (SURVEY.md §6 quality gate for the 8k push).

Two modes:

--px 64 (the r2 study, kept for continuity): flagship-class vs the
  throughput128 DELTAS scaled to the 64px synthetic task, at EQUAL
  STEPS.

--px 128 (default, VERDICT r2 item #2): the ACTUAL bench recipes —
  configs/celeba.py's flagship model/loss vs configs/speed128.py's
  48-channel trunk (and the r3 rungs) — on a 128px / 10-part synthetic
  task, at EQUAL WALL-CLOCK: each variant's step budget is scaled by
  its measured bench rate (img/s/chip, docs/perf_ledger.md), so a
  recipe that steps 3.4× faster trains 3.4× more steps, exactly what a
  fixed training-hour budget buys. The gate makes the bench default
  defensible: the default must be the FASTEST recipe whose
  equal-wall-clock landmark error and mIoU match or beat the flagship
  recipe's (5% tolerance); otherwise revert the default to the fastest
  recipe that passes.

Run: python tools/quality_study.py [--px 128] [--base_steps 800]
Prints one JSON line; paste the table into STATUS.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS_64 = {
    # Flagship-class at 64px synthetic (configs/synthetic.py defaults).
    "quality": [],
    # The throughput128 deltas, scaled to the 64px synthetic task:
    # depth 3→2, decoder 3→2 scales, VGG features at half res (32²)
    # with blocks ≤2 — mirroring configs/throughput128.py vs celeba.py.
    "throughput": [
        "model.depth=2",
        "model.decoder_scales=2",
        "loss.vgg_resolution=32",
        "loss.vgg_trim_blocks=2",
        "loss.vgg_layers=('relu1_2','relu2_2')",
    ],
}

# 128px mode: identical data/optimizer/augmentation; ONLY the model and
# loss fields that differ between configs/celeba.py and
# configs/speed128.py (plus the r3 rungs) vary. Rates are measured
# bench.py img/s/chip values (docs/perf_ledger.md) used to convert the
# shared wall-clock budget into per-variant step budgets.
PX128_BASE = [
    "model.img_size=128",
    "model.n_parts=10",
    "dataset_kwargs=(('size',128),('n_blobs',10),('n_examples',2048))",
    "global_batch=64",
    "optim.decay_steps=20000",
]

FLAGSHIP_128 = [
    # configs/celeba.py = PartNetConfig + LossConfig defaults; the
    # synthetic base config is smaller, so reset every differing field.
    "model.features=128",
    "model.app_features=128",
    "model.depth=4",
    "model.decoder_scales=4",
    "model.decoder_features=(256,128,64,32)",
    "loss.vgg_layers=('relu1_2','relu2_2','relu3_2','relu4_2')",
    "loss.vgg_trim_blocks=4",
    "loss.vgg_resolution=None",
]

SPEED128 = [
    "model.features=48",
    "model.app_features=48",
    "model.depth=3",
    "model.decoder_scales=3",
    "model.decoder_features=(96,48,24)",
    "loss.vgg_layers=('relu1_2','relu2_2')",
    "loss.vgg_trim_blocks=2",
    "loss.vgg_resolution=64",
]

VARIANTS_128 = {
    # name: (overrides, measured img/s/chip at B=128)
    "flagship": (FLAGSHIP_128, 824.6),
    "speed128": (SPEED128, 2818.4),
    # r3 rungs — rates filled in from the r3 probe ladder as measured.
    "speed128_d64": (SPEED128 + ["model.decoder_out_size=64"], None),
    "speed128_r3": (
        SPEED128 + ["model.decoder_out_size=64", "model.stem_stride=4"],
        None,
    ),
    # r4 candidate rungs (docs/perf_ledger.md "written path to 8,000").
    # Rates must come from bench.py runs via --rate.
    "speed128_r3_we2": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=2",
        ],
        None,
    ),
    "speed128_r3_v1": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    "speed128_r4": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    # warp_every=3 — the middle rung between the shipped we2 (PASS,
    # 11,042) and we4 (12,827 but gate-FAIL on mIoU): warp amortized /3.
    "speed128_r4_we3": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=3",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    # warp_every=4 on top of the combined rung: 4-step unrolled period,
    # equivariance pairing on every 4th step only — higher quality risk,
    # gate before any adoption.
    "speed128_r4_we4": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=4",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    # warp_fraction on top of the shipped we2 rung: warp only the first
    # B·f samples of each warp-on sub-step (augment/pair.py) — the warp
    # kernel runs on a sub-batch, so its cost (and the layout copies
    # around it) shrink ∝ f while EVERY warp-on step keeps true-warp
    # equivariance pairs. we2+wf50 ≈ we4's warp cost with we2's cadence
    # — probing whether we4's gate failure was cadence (this passes) or
    # total warped-pair count (this fails too).
    "speed128_r4_wf50": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "augment.warp_fraction=0.5",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    # Per-step signal at quarter cost (no cadence cut at all): the
    # direct repair hypothesis for we4's mIoU failure.
    "speed128_r4_wf25": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_fraction=0.25",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
        ],
        None,
    ),
    # r5 byte-cut rung: decode AND take the loss at 32² (the decoder
    # drops its 64² scale entirely; the perceptual loss pools the
    # target to the recon res automatically — losses/perceptual.py).
    # Part maps stay at 32² (stem_stride=4), so the seg/equivariance
    # paths are untouched; only reconstruction detail drops. The r3
    # precedent (decoder_out_size=64 = decode at the loss res) PASSED
    # and even improved mIoU.
    "speed128_r5_d32": (
        SPEED128
        + [
            "model.decoder_out_size=32",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
            "loss.vgg_resolution=32",
        ],
        None,
    ),
    # r5 composition: d32 byte cut + wf50 warp cut (each individually
    # probed; gate the composition that would ship).
    "speed128_r5_wf50d32": (
        SPEED128
        + [
            "model.decoder_out_size=32",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "augment.warp_fraction=0.5",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
            "loss.vgg_resolution=32",
        ],
        None,
    ),
    # r5 follow-up: quarter-batch warp on the ADOPTED wf50d32 default —
    # warp signal still lands EVERY warp-on step (no cadence cut), at
    # half of wf50's warp cost. Probed 24,780.3 img/s/chip with scan8
    # (21,242.0 no-scan budget rate), +12% over the shipped default.
    "speed128_r5_wf25d32": (
        SPEED128
        + [
            "model.decoder_out_size=32",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "augment.warp_fraction=0.25",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
            "loss.vgg_resolution=32",
        ],
        None,
    ),
    # data_echo=4 on top of the shipped default: each host batch feeds
    # 4 steps with fresh augmentation draws (host decode demand ÷ 4 —
    # the input-bound-host lever; bench --pipeline measured 913 → 3,256
    # img/s on the 1-core sandbox). Device rate is unchanged, so the
    # budget rate equals the r4 rung's.
    "speed128_r4_echo4": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
            "data_echo=4",
        ],
        None,
    ),
    # f8 fusion-boundary activation storage on top of the combined r4
    # rung (blocks.f8_store; straight-through grad).
    "speed128_r4_f8": (
        SPEED128
        + [
            "model.decoder_out_size=64",
            "model.stem_stride=4",
            "augment.warp_every=2",
            "loss.vgg_layers=('relu1_2',)",
            "loss.vgg_trim_blocks=1",
            "model.act_quant=f8",
        ],
        None,
    ),
}


def _run_json(cmd) -> dict:
    """Run a tool subprocess and parse the LAST json line it prints."""
    import subprocess
    import sys

    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    sys.stdout.write(r.stdout)
    if r.stderr:
        sys.stderr.write(r.stderr[-2000:])
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{cmd[:4]}... printed no JSON (rc={r.returncode})")


def run_variant(name, overrides, steps, base_dir, segment_steps=600,
                scan=1, resume=False, device_data=False, ckpt_every=None):
    """Train (leak-bounded, fresh process per segment) then eval, all in
    subprocesses: the axon transport leaks its host staging buffer on
    EVERY host->device transfer (~13 MB/step at B=64/128px, measured —
    docs/perf_ledger.md r4), so a long single-process study run decays
    from ~200 to <30 img/s as RSS grows. Segmenting through the
    exactness-tested CLI resume path keeps every process short-lived;
    the trained numerics equal one long run.

    resume=True continues a killed/crashed study run from the variant's
    latest checkpoint instead of wiping it (restore-latest + iterator
    seek — the same exactness-tested path segmenting already uses, so
    the trained numerics still equal one uninterrupted run)."""
    import shutil
    import subprocess
    import sys

    out_dir = os.path.join(base_dir, name)
    if not resume:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(f"=== variant {name}: steps={steps} overrides={overrides} ===",
          flush=True)
    common = [*overrides, "log_every=50", "image_log_every=0"]
    if device_data:
        # HBM-resident dataset + on-device gather (train/loop.py): the
        # study's synthetic set (~400 MB at 128px/2048ex) stops being
        # uploaded per dispatch — on the axon tunnel that upload IS the
        # study wall (~37 MB/s ≈ 3 steps/s at B=64; measured r4). Same
        # batch/step sequence; cross-executable roundoff drift only.
        common += ["device_data=True"]
    if scan > 1:
        # scan_groups batches `scan` fetch groups per dispatch
        # (train/step.compose_scan — same step sequence, roundoff-level
        # drift only), amortizing the axon tunnel's per-dispatch round trip
        # that makes study training dispatch-bound (~1.4–3 steps/s wall
        # at sub-10ms device steps). Checkpoints must land on dispatch
        # boundaries: ckpt_every defaults to the segment length but can
        # be set finer (still span-aligned) — with device_data the
        # per-dispatch transfers are tiny, so segments can span the
        # whole budget (axon recompiles EVERY fresh process ~6-8 min;
        # one process per variant) while crash-resume keeps a finer
        # checkpoint cadence.
        common += [f"scan_groups={scan}",
                   f"ckpt_every={ckpt_every or segment_steps}"]
    restore_flag = [] if resume else ["--no-restore"]
    r = subprocess.run(
        [sys.executable, "-m", "partseg_tpu.train.cli",
         "--config", "configs/synthetic.py", "--ckpt_dir", out_dir,
         "--steps", str(steps), "--segment_steps", str(segment_steps),
         *restore_flag, "--set", *common],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        raise RuntimeError(f"training {name} failed rc={r.returncode}")
    syn = _run_json([sys.executable, "tools/validate_synthetic.py",
                     "--eval_only", "--out_dir", out_dir,
                     "--steps", str(steps), "--set", *common])
    seg = _run_json([sys.executable, "tools/validate_segmentation.py",
                     "--ckpt_dir", out_dir, "--set", *common])
    return {
        "steps": steps,
        "landmark_err_pct_diag": syn["landmark_err_pct_diag_trained"],
        "equiv_last": syn["equiv_last"],
        "miou": seg["miou_trained"],
        "fg_iou": seg["fg_iou_trained"],
        "learned": bool(syn["ok"]),
        "seg_abs_pass": bool(seg["ok"]),
    }


def main_64(steps: int, base_dir: str):
    rows = {
        name: run_variant(name, ov, steps, base_dir)
        for name, ov in VARIANTS_64.items()
    }
    q, t = rows["quality"], rows["throughput"]
    result = {
        "mode": "64px_equal_steps",
        "steps": steps,
        "quality": q,
        "throughput": t,
        # Relative gate, loose by design (the throughput recipe trains
        # with ~60% fewer FLOPs → ~2.5× more steps per wall-hour).
        "gate_pass": bool(
            t["learned"]
            and t["landmark_err_pct_diag"] <= 2.0 * q["landmark_err_pct_diag"]
            and t["miou"] >= 0.7 * q["miou"]
        ),
    }
    print(json.dumps(result))
    return result


def _aggregate_seeds(per_seed: dict[int, dict]) -> dict:
    """Mean metrics over seed replicas (VERDICT r4 weak #4: gate
    decisions rode single runs). The gate compares MEANS; the per-seed
    rows and max-min spread ship in the row for the evidence trail —
    a PASS is only trustworthy if the spread is smaller than the gate
    margin."""
    keys = ("landmark_err_pct_diag", "equiv_last", "miou", "fg_iou")
    rows = list(per_seed.values())
    agg = dict(rows[0])
    for k in keys:
        vals = [r[k] for r in rows]
        agg[k] = sum(vals) / len(vals)
    agg["learned"] = all(r["learned"] for r in rows)
    agg["seg_abs_pass"] = all(r["seg_abs_pass"] for r in rows)
    agg["n_seeds"] = len(rows)
    agg["seed_rows"] = {str(s): r for s, r in per_seed.items()}
    agg["seed_spread"] = {
        k: max(r[k] for r in rows) - min(r[k] for r in rows) for k in keys
    }
    return agg


def main_128(base_steps: int, base_dir: str, variants: list[str],
             rates: dict[str, float] | None = None,
             anchor_json: str | None = None, scan: int = 1,
             segment_steps: int = 600, resume: bool = False,
             device_data: bool = False, seeds: int = 1,
             ckpt_every: int | None = None):
    """Equal-WALL-CLOCK study: variant v trains
    base_steps × rate_v / rate_flagship steps (same global batch, so
    steps/s ∝ img/s/chip).

    anchor_json: path to a prior run's result.json; its rows are
    reused for any variant not re-listed in --variants (same protocol:
    base_steps must match), so new rungs can be gated against the
    archived flagship anchor without retraining it.
    """
    rates = rates or {}
    prior_rows = {}
    if anchor_json:
        with open(anchor_json) as f:
            prior = json.load(f)
        if prior.get("base_steps") != base_steps:
            raise SystemExit(
                f"anchor {anchor_json} ran base_steps={prior.get('base_steps')}"
                f" != {base_steps}; rows are not comparable"
            )
        prior_rows = prior["rows"]
    sel = {}
    for name in variants:
        ov, rate = VARIANTS_128[name]
        rate = rates.get(name, rate)
        if rate is None:
            raise SystemExit(
                f"variant {name} has no measured rate — pass "
                f"--rate {name}=<img/s/chip> from a bench.py run"
            )
        sel[name] = (ov, rate)
    if "flagship" not in sel and "flagship" not in prior_rows:
        raise SystemExit("the 128px study needs the flagship anchor")

    flag_rate = (
        sel["flagship"][1] if "flagship" in sel
        else prior_rows["flagship"]["img_s_chip"]
    )
    rows = {k: dict(v) for k, v in prior_rows.items() if k not in sel}
    for name, (ov, rate) in sel.items():
        steps = max(1, round(base_steps * rate / flag_rate))
        # warp_every periods compile as one program, data_echo
        # re-dispatches them, scan_groups scans over them; budgets round
        # UP to whole dispatch spans (the train loop rejects partial
        # warp_every*data_echo*scan_groups spans).
        we = next((int(o.split("=")[1]) for o in ov
                   if o.startswith("augment.warp_every=")), 1)
        we *= next((int(o.split("=")[1]) for o in ov
                    if o.startswith("data_echo=")), 1)
        span = we * scan
        if span > 1 and steps % span:
            steps += span - steps % span
        if scan > 1 and segment_steps % span:
            raise SystemExit(
                f"--scan {scan}: segment_steps={segment_steps} must be a "
                f"multiple of the dispatch span {span} for variant {name}"
            )
        if seeds == 1:
            rows[name] = run_variant(name, PX128_BASE + ov, steps, base_dir,
                                     segment_steps=segment_steps, scan=scan,
                                     resume=resume, device_data=device_data,
                                     ckpt_every=ckpt_every)
        else:
            # Seed replicas: seed 0 keeps the historical name/dir (so a
            # prior single-seed run resumes as replica 0); seed s>0
            # overrides cfg.seed, which drives init, data order, and
            # per-sample augmentation keys (train/loop.py:221-274).
            per_seed = {}
            for s in range(seeds):
                rname = name if s == 0 else f"{name}_s{s}"
                sov = ov if s == 0 else ov + [f"seed={s}"]
                per_seed[s] = run_variant(
                    rname, PX128_BASE + sov, steps, base_dir,
                    segment_steps=segment_steps, scan=scan,
                    resume=resume, device_data=device_data,
                    ckpt_every=ckpt_every)
            rows[name] = _aggregate_seeds(per_seed)
        rows[name]["img_s_chip"] = rate

    f = rows["flagship"]
    verdicts = {}
    for name, r in rows.items():
        if name == "flagship":
            continue
        verdicts[name] = bool(
            r["learned"]
            and r["landmark_err_pct_diag"]
            <= 1.05 * f["landmark_err_pct_diag"]
            and r["miou"] >= 0.95 * f["miou"]
        )
    passing = [n for n, ok in verdicts.items() if ok]
    fastest_pass = (
        max(passing, key=lambda n: rows[n]["img_s_chip"]) if passing else None
    )
    result = {
        "mode": "128px_equal_wallclock",
        "base_steps": base_steps,
        "seeds": seeds,
        "rows": rows,
        "pass_at_equal_wallclock": verdicts,
        "fastest_passing_variant": fastest_pass,
        "gate_pass": bool(passing),
    }
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, "result.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    # NOTE: no jax import here — the study parent is a pure orchestrator
    # (training segments and evals run in child processes; the single
    # device must never be held by an idle parent). Children enable the
    # compilation cache themselves.
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=128, choices=(64, 128))
    ap.add_argument("--steps", type=int, default=800,
                    help="64px mode: equal steps per variant")
    ap.add_argument("--base_steps", type=int, default=800,
                    help="128px mode: the FLAGSHIP's step budget; faster "
                         "variants scale up by their bench rate")
    ap.add_argument("--base_dir", default="logs/quality_study")
    ap.add_argument("--variants", default="flagship,speed128")
    ap.add_argument("--rate", action="append", default=[],
                    metavar="NAME=IMG_S", help="override/provide a "
                    "variant's measured bench rate")
    ap.add_argument("--anchor_json", default=None,
                    help="reuse rows (incl. the flagship anchor) from a "
                         "prior result.json instead of retraining them")
    ap.add_argument("--scan", type=int, default=1,
                    help="scan_groups for the TRAINING segments "
                         "(step-sequence-preserving dispatch batching; cuts "
                         "the tunnel-bound study wall-clock severalfold)")
    ap.add_argument("--segment_steps", type=int, default=600,
                    help="steps per fresh-process training segment "
                         "(bounds the axon transfer leak)")
    ap.add_argument("--device_data", action="store_true",
                    help="train study variants with cfg.device_data: the "
                         "synthetic set lives in HBM and steps fetch by "
                         "index — removes the per-dispatch batch upload "
                         "that makes tunnel-bound studies ~3 steps/s")
    ap.add_argument("--ckpt_every", type=int, default=None,
                    help="checkpoint cadence inside a segment (span-"
                         "aligned); default = segment_steps. Lets one "
                         "long segment (one axon compile) keep a finer "
                         "crash-resume cadence")
    ap.add_argument("--seeds", type=int, default=1,
                    help="seed replicas per NEW variant row (gate on the "
                         "mean; per-seed rows + spread recorded). Seed 0 "
                         "is the historical protocol; s>0 sets cfg.seed=s")
    ap.add_argument("--resume", action="store_true",
                    help="continue a killed/crashed study from each "
                         "variant's latest checkpoint instead of wiping "
                         "its run dir (exactness-tested restore+seek; "
                         "numerics equal one uninterrupted run)")
    a = ap.parse_args()
    if a.px == 64:
        r = main_64(a.steps, a.base_dir)
    else:
        rates = dict(
            (k, float(v)) for k, v in (s.split("=") for s in a.rate)
        )
        r = main_128(a.base_steps, a.base_dir, a.variants.split(","), rates,
                     anchor_json=a.anchor_json, scan=a.scan,
                     segment_steps=a.segment_steps, resume=a.resume,
                     device_data=a.device_data, seeds=a.seeds,
                     ckpt_every=a.ckpt_every)
    raise SystemExit(0 if r["gate_pass"] else 1)
