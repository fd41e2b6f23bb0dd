"""Eval CLI: landmark regression over an annotated split.

python -m partseg_tpu.evals.cli --config configs/celeba.py \
    --ckpt_dir logs/celeba [--dataset celeba_mafl] [--max_batches N]
"""

from __future__ import annotations

import argparse
import json

from partseg_tpu.data.loader import make_loader
from partseg_tpu.data.registry import build_dataset
from partseg_tpu.evals.infer import load_model_and_params
from partseg_tpu.evals.landmarks import evaluate_landmarks
from partseg_tpu.train.config import load_config


def main(argv=None):
    ap = argparse.ArgumentParser(description="partseg_tpu landmark eval")
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--dataset", default=None, help="override cfg.dataset")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--dump", default=None, metavar="OUT.npz",
                    help="also dump mu + ground truth for offline analysis "
                         "(the reference iterator's eval_op role)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    name = args.dataset or cfg.dataset
    model, params = load_model_and_params(cfg, args.ckpt_dir)

    kwargs = dict(cfg.dataset_kwargs)
    # drop_remainder=False: the eval protocol must see the WHOLE split
    # (MAFL-test is 1,000 images; dropping the tail 40 at batch 64 is a
    # protocol deviation). collect_mu pads+trims the remainder batch.
    train_it = make_loader(
        build_dataset(name, split="train", **kwargs),
        args.batch, shuffle=False, num_epochs=1, drop_remainder=False,
    )
    test_it = make_loader(
        build_dataset(name, split="test", **kwargs),
        args.batch, shuffle=False, num_epochs=1, drop_remainder=False,
    )
    if args.dump:
        import numpy as np

        from partseg_tpu.evals.landmarks import collect_mu

        mu_te, gt_te = collect_mu(model, params, test_it, args.max_batches)
        np.savez_compressed(args.dump, mu=mu_te, landmarks=gt_te)
        print(f"[eval] dumped {len(mu_te)} examples to {args.dump}")
        test_it = make_loader(
            build_dataset(name, split="test", **kwargs),
            args.batch, shuffle=False, num_epochs=1, drop_remainder=False,
        )

    metrics = evaluate_landmarks(
        model, params, train_it, test_it, max_batches=args.max_batches
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
