"""Checkpointing: orbax-backed latest+best retention with async saves.

Reference behavior (SURVEY.md C18): ``torch.save`` of model+optimizer state
under ``out/<experiment-id>/``, keeping latest and best-by-val-PCKh, with
resume support.  TPU-native: orbax ``CheckpointManager`` (async, multi-host
safe), checkpointing the full :class:`TrainState` (params, batch stats,
optimizer state, PRNG key, step) plus the JSON config, so evaluate/infer can
rebuild the exact model (builder-args-with-checkpoint parity).
"""

from __future__ import annotations

import json
import os


import jax
import orbax.checkpoint as ocp

from ..utils.config import Config, config_from_json, config_to_json

CONFIG_FILENAME = "config.json"
BEST_STEP_FILENAME = "best.json"


class CheckpointManager:
    def __init__(self, out_dir: str, cfg: Config | None = None,
                 max_to_keep: int = 3):
        self.dir = os.path.abspath(out_dir)
        os.makedirs(self.dir, exist_ok=True)
        if cfg is not None and jax.process_index() == 0:
            with open(os.path.join(self.dir, CONFIG_FILENAME), "w") as f:
                f.write(config_to_json(cfg))
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True),
        )

    def save(self, epoch: int, state, *, is_best: bool = False,
             metrics: dict | None = None):
        self.mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": epoch,
                                        "metrics": metrics or {}}),
            ),
        )
        if is_best and jax.process_index() == 0:
            with open(os.path.join(self.dir, BEST_STEP_FILENAME), "w") as f:
                json.dump({"epoch": epoch, "metrics": metrics or {}}, f)

    def restore(self, state_template, epoch: int | None = None):
        """Restore latest (or given epoch / recorded best) into the template."""
        if epoch is None:
            epoch = self.mgr.latest_step()
        if epoch is None:
            return None, None
        restored = self.mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def best_epoch(self) -> int | None:
        path = os.path.join(self.dir, BEST_STEP_FILENAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)["epoch"]

    def load_config(self) -> Config | None:
        path = os.path.join(self.dir, CONFIG_FILENAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return config_from_json(f.read())

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()


def load_config_from_dir(out_dir: str) -> Config:
    path = os.path.join(out_dir, CONFIG_FILENAME)
    with open(path) as f:
        return config_from_json(f.read())
