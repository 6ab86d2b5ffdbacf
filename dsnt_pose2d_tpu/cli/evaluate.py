"""Evaluate CLI (reference ``evaluate.py`` surface, SURVEY.md C16):
load a checkpoint, run the validation split, print the PCKh@0.5 table."""

from __future__ import annotations

import argparse

from ..models.factory import build_pose_model
from ..parallel.mesh import initialize_distributed, make_mesh
from ..train.checkpoint import CheckpointManager
from ..train.loop import EvalDriver
from .common import (add_data_args, add_platform_arg, apply_platform,
                     make_datasets, make_loaders, merge_cli_overrides)


def main(argv=None):
    p = argparse.ArgumentParser("dsnt-pose2d-tpu evaluate")
    p.add_argument("--model-dir", required=True,
                   help="experiment dir containing config.json + ckpt/")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch (default: best if recorded, else latest)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="override eval batch size")
    p.add_argument("--flip-eval", action="store_true",
                   help="average predictions with a horizontally-flipped pass")
    p.add_argument("--eval-scales", default="1.0",
                   help="comma-separated crop scales to average predictions "
                        "over (multi-scale eval), e.g. '0.9,1.0,1.1'")
    add_data_args(p)
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    initialize_distributed()
    ckpt = CheckpointManager(args.model_dir)
    cfg = ckpt.load_config()
    if cfg is None:
        raise SystemExit(f"no config.json in {args.model_dir}")
    cfg = merge_cli_overrides(cfg, args, p, argv)

    model = build_pose_model(cfg.model)
    mesh = make_mesh(model_parallel=cfg.train.model_parallel)
    _, val_ds = make_datasets(cfg)
    _, val_loader = make_loaders(cfg, val_ds, val_ds)

    driver = EvalDriver(model=model, cfg=cfg, mesh=mesh, loader=val_loader)
    template = driver.init_state()
    epoch = args.epoch if args.epoch is not None else ckpt.best_epoch()
    state, meta = ckpt.restore(template, epoch=epoch)
    if state is None:
        raise SystemExit("no checkpoint found")
    result = driver.evaluate(state)
    from .common import dataset_split_method

    result["evaluator"].provenance = dataset_split_method(val_ds)
    print(result["evaluator"].table())
    print(f"val loss {result['loss']:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
