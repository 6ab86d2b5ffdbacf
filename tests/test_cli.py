"""CLI surface tests: flag parsing mirrors the reference's experiment schema
(SURVEY.md section 5 config system); no device work here."""

import argparse

import pytest

from dsnt_pose2d_tpu.cli.common import (
    add_data_args,
    add_model_args,
    add_train_args,
    config_from_args,
    experiment_dir,
)


def _parse(argv):
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    return p.parse_args(argv)


def test_defaults_match_reference_schema():
    cfg = config_from_args(_parse([]))
    assert cfg.model.base == "hg1"
    assert cfg.model.output_strat == "dsnt"
    assert cfg.model.preact == "softmax"
    assert cfg.model.reg == "none"
    assert cfg.optim.lr == pytest.approx(2.5e-4)
    assert cfg.optim.optimizer == "rmsprop"
    assert cfg.train.epochs == 120
    assert cfg.train.batch_size == 32


def test_flag_round_trip():
    cfg = config_from_args(_parse([
        "--base-model", "hg8", "--output-strat", "gauss", "--reg", "js",
        "--reg-coeff", "2.5", "--hm-sigma", "0.5", "--dilate", "2",
        "--truncate", "1", "--preact", "thresholded_softmax",
        "--batch-size", "64", "--epochs", "10", "--lr", "0.001",
        "--no-pallas", "--dtype", "float32",
    ]))
    m = cfg.model
    assert (m.base, m.output_strat, m.reg) == ("hg8", "gauss", "js")
    assert m.reg_coeff == 2.5 and m.hm_sigma == 0.5
    assert m.dilate == 2 and m.truncate == 1
    assert m.preact == "thresholded_softmax"
    assert not m.use_pallas and m.dtype == "float32"
    assert cfg.train.batch_size == 64 and cfg.train.epochs == 10


def test_all_reference_base_models_accepted():
    for base in ("hg1", "hg2", "hg4", "hg8", "resnet18", "resnet34",
                 "resnet50", "resnet101"):
        cfg = config_from_args(_parse(["--base-model", base]))
        assert cfg.model.base == base


def test_invalid_choices_rejected():
    with pytest.raises(SystemExit):
        _parse(["--output-strat", "bogus"])
    with pytest.raises(SystemExit):
        _parse(["--reg", "l3"])
    with pytest.raises(SystemExit):
        _parse(["--preact", "softplus"])


def test_experiment_dir_uses_id():
    cfg = config_from_args(_parse(["--out-dir", "/tmp/o", "--experiment-id", "x1"]))
    assert experiment_dir(cfg) == "/tmp/o/x1"


def test_merge_cli_overrides_applies_all_data_flags():
    # evaluate/infer reconstruct cfg from the checkpoint; every parsed data
    # flag must actually land in the merged config (VERDICT r2 items 2/4).
    from dsnt_pose2d_tpu.cli.common import add_data_args, merge_cli_overrides
    from dsnt_pose2d_tpu.utils.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--flip-eval", action="store_true")
    add_data_args(p)
    argv = [
        "--data-dir", "/elsewhere/mpii", "--data-source", "h5",
        "--canvas-size", "320", "--warp-method", "gather",
        "--workers", "8", "--batch-size", "4", "--flip-eval"]
    args = p.parse_args(argv)
    cfg = merge_cli_overrides(Config(), args, p, argv)
    assert cfg.data.data_dir == "/elsewhere/mpii"
    assert cfg.data.source == "h5"
    assert cfg.data.canvas_size == 320
    assert cfg.data.warp_method == "gather"
    assert cfg.data.workers == 8
    assert cfg.train.batch_size == 4
    assert cfg.train.flip_eval is True

    # Flags left at their defaults do NOT clobber the checkpoint config.
    import dataclasses

    base = Config()
    base = dataclasses.replace(
        base, data=dataclasses.replace(base.data, warp_method="gather",
                                       workers=4))
    argv = ["--data-dir", "/x"]
    args = p.parse_args(argv)
    merged = merge_cli_overrides(base, args, p, argv)
    assert merged.data.data_dir == "/x"
    assert merged.data.warp_method == "gather"
    assert merged.data.workers == 4
    assert merged.train.flip_eval is False


def test_merge_cli_overrides_explicit_default_and_source_reset():
    # A flag explicitly typed AT its argparse default must still override a
    # checkpoint config that differs; and --data-dir without an explicit
    # --data-source re-detects the layout (source -> auto) instead of
    # inheriting the training-time source.
    import dataclasses

    from dsnt_pose2d_tpu.cli.common import add_data_args, merge_cli_overrides
    from dsnt_pose2d_tpu.utils.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--flip-eval", action="store_true")
    add_data_args(p)

    base = Config()
    base = dataclasses.replace(
        base, data=dataclasses.replace(base.data, source="h5", workers=1))

    # --workers 4 IS the argparse default; it must still override workers=1.
    from dsnt_pose2d_tpu.cli.common import WORKERS_DEFAULT
    assert p.get_default("workers") == WORKERS_DEFAULT == 4, \
        "update this test if the --workers default changes"
    argv = ["--data-dir", "/other", "--workers", "4"]
    args = p.parse_args(argv)
    merged = merge_cli_overrides(base, args, p, argv)
    assert merged.data.workers == 4
    assert merged.data.data_dir == "/other"
    assert merged.data.source == "auto"  # reset: re-detect at the new dir

    # ... unless --data-source is itself explicit.
    argv = ["--data-dir", "/other", "--data-source", "h5"]
    args = p.parse_args(argv)
    merged = merge_cli_overrides(base, args, p, argv)
    assert merged.data.source == "h5"


def test_eval_scales_flag_merges():
    from dsnt_pose2d_tpu.cli.common import (add_data_args,
                                            merge_cli_overrides,
                                            parse_eval_scales)
    from dsnt_pose2d_tpu.utils.config import Config

    assert parse_eval_scales("0.9,1.0,1.1") == (0.9, 1.0, 1.1)
    assert parse_eval_scales((0.8, 1.2)) == (0.8, 1.2)
    with pytest.raises(ValueError):
        parse_eval_scales("0,-1")

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--flip-eval", action="store_true")
    p.add_argument("--eval-scales", default="1.0")
    add_data_args(p)
    argv = ["--eval-scales", "0.9,1.0,1.1"]
    merged = merge_cli_overrides(Config(), p.parse_args(argv), p, argv)
    assert merged.train.eval_scales == (0.9, 1.0, 1.1)
    # Not passed -> checkpoint value survives.
    merged = merge_cli_overrides(Config(), p.parse_args([]), p, [])
    assert merged.train.eval_scales == (1.0,)


def test_hm_threshold_flag():
    cfg = config_from_args(_parse(["--preact", "thresholded_softmax",
                                   "--hm-threshold", "0.5"]))
    assert cfg.model.hm_threshold == 0.5


def test_config_presets_load():
    import glob
    import json
    import os

    from dsnt_pose2d_tpu.utils.config import config_from_json

    presets = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "*.json"))
    assert len(presets) == 6
    for path in presets:
        cfg = config_from_json(open(path).read())
        assert cfg.model.base in ("hg1", "hg2", "hg4", "hg8", "resnet50", "vit_s16")
