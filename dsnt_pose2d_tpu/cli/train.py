"""Train CLI (reference ``train.py`` surface, SURVEY.md C15).

Example (BASELINE config #3, flagship):

    python -m dsnt_pose2d_tpu.cli.train --base-model hg8 --output-strat dsnt \
        --reg js --reg-coeff 1.0 --hm-sigma 1.0 --batch-size 32 --epochs 120
"""

from __future__ import annotations

import argparse

import jax

from ..models.factory import build_pose_model
from ..parallel.mesh import initialize_distributed, make_mesh
from ..train.checkpoint import CheckpointManager
from ..train.loop import Trainer
from ..train.metrics import MetricWriter
from .common import (
    add_platform_arg,
    apply_platform,
    add_data_args,
    add_model_args,
    add_train_args,
    config_from_args,
    experiment_dir,
    make_datasets,
    make_loaders,
)


def main(argv=None):
    p = argparse.ArgumentParser("dsnt-pose2d-tpu train")
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    add_platform_arg(p)
    p.add_argument("--dashboard-port", type=int, default=0,
                   help="serve a live metrics dashboard on this port")
    p.add_argument("--tensorboard", action="store_true",
                   help="also mirror scalar metrics to <out-dir>/tb "
                        "TensorBoard event files")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (CI/debug posture)")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace of early steps here")
    args = p.parse_args(argv)
    apply_platform(args)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    initialize_distributed()
    cfg = config_from_args(args)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(model_parallel=cfg.train.model_parallel)
    out_dir = experiment_dir(cfg)

    train_ds, val_ds = make_datasets(cfg)
    train_loader, val_loader = make_loaders(cfg, train_ds, val_ds)

    ckpt = CheckpointManager(out_dir, cfg, max_to_keep=cfg.train.keep_checkpoints)
    writer = MetricWriter(out_dir, echo=jax.process_index() == 0,
                          tensorboard=args.tensorboard)
    if args.dashboard_port and jax.process_index() == 0:
        from ..train.dashboard import serve

        serve(out_dir, args.dashboard_port)
        print(f"dashboard: http://localhost:{args.dashboard_port}/")
    hooks = ()
    if args.profile_dir:
        from ..train.profiling import make_profile_hook

        hooks = (make_profile_hook(args.profile_dir),)
    trainer = Trainer(model=model, cfg=cfg, mesh=mesh,
                      train_loader=train_loader, val_loader=val_loader,
                      checkpointer=ckpt, metric_writer=writer, hooks=hooks)

    state = None
    start_epoch = 0
    start_step = 0
    best_pckh = -1.0
    if args.resume:
        template = trainer.init_state()
        restored, meta = ckpt.restore_latest(template)
        if restored is not None:
            state = restored
            if meta.get("step_in_epoch", 0):
                # Mid-epoch save: re-enter the same epoch at the offset.
                start_epoch = int(meta["epoch"])
                start_step = int(meta["step_in_epoch"])
            else:
                start_epoch = int(meta["epoch"]) + 1
            # Seed the best-model tracker so a worse resumed model does not
            # immediately overwrite the recorded best checkpoint.
            best_pckh = float(ckpt.best_metrics().get("val_pckh", -1.0))
            print(f"resumed from epoch {meta['epoch']}"
                  + (f" step {start_step}" if start_step else ""))

    state, best = trainer.run(state, start_epoch=start_epoch,
                              best_pckh=best_pckh, start_step=start_step)
    print(f"done; best val PCKh@0.5 = {100 * best:.2f}")
    writer.close()
    ckpt.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
