"""Child process for the two-process DCN test (NOT a pytest file).

Run: python tests/_multihost_child.py <pid> <nproc> <port> <outdir>
Each process contributes its per-host half of a global batch via
train.loop._globalize, runs ONE shard_map DP train step over the global
mesh (collectives ride the Gloo CPU backend — the DCN stand-in), and
writes its loss to <outdir>/loss_<pid>.txt.
"""

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = pathlib.Path(sys.argv[4])
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import numpy as np

    from partseg_tpu.augment.pair import AugmentConfig
    from partseg_tpu.dist.mesh import (
        batch_sharding,
        create_replicated,
        make_mesh,
    )
    from partseg_tpu.models.partnet import PartNet, PartNetConfig
    from partseg_tpu.train.config import LossConfig, OptimConfig, TrainConfig
    from partseg_tpu.train.loop import _globalize, build_perceptual, build_step_fn
    from partseg_tpu.train.state import create_state

    cfg = TrainConfig(
        model=PartNetConfig(n_parts=3, img_size=16, features=16, depth=1,
                            app_features=8, decoder_scales=2,
                            use_pallas=False),
        augment=AugmentConfig(tps_grid=3),
        loss=LossConfig(vgg_layers=("relu1_2",), vgg_trim_blocks=1),
        optim=OptimConfig(warmup_steps=2, decay_steps=10),
        global_batch=8,
    )
    model = PartNet(cfg.model)
    mesh = make_mesh()
    assert jax.process_count() == nproc
    state = create_replicated(
        lambda: create_state(cfg, model, jax.random.key(0)), mesh
    )

    per_host = cfg.global_batch // nproc
    gids = np.arange(per_host, dtype=np.int32) + pid * per_host
    # Images deterministic per GLOBAL id: both topologies see identical data.
    imgs = np.stack([
        np.random.default_rng(int(g)).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        for g in gids
    ])
    bsh = batch_sharding(mesh)
    batch = {"image": _globalize(imgs, bsh), "aug_id": _globalize(gids, bsh)}

    step_fn = build_step_fn(
        cfg, model, cfg.augment.make_sampler(), build_perceptual(cfg), mesh
    )
    new_state, metrics = step_fn(state, batch, jax.random.key(7))
    jax.block_until_ready(new_state.params)
    loss = float(metrics["loss"])
    (outdir / f"loss_{pid}.txt").write_text(repr(loss))
    print(f"p{pid}: loss={loss}", flush=True)


if __name__ == "__main__":
    main()
