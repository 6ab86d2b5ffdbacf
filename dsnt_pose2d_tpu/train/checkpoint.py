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
        # Separate one-slot store so the best-by-val-PCKh checkpoint survives
        # the rolling max_to_keep GC (reference keeps latest AND best).
        self.best_mgr = ocp.CheckpointManager(
            os.path.join(self.dir, "ckpt_best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True,
                enable_async_checkpointing=True),
        )
        # Mid-epoch saves, keyed by GLOBAL optimizer step (separate store so
        # step keys never collide with the epoch-keyed rolling store).
        self.step_mgr = ocp.CheckpointManager(
            os.path.join(self.dir, "ckpt_step"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=2, create=True,
                enable_async_checkpointing=True),
        )

    def save(self, epoch: int, state, *, is_best: bool = False,
             metrics: dict | None = None):
        self.mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": epoch,
                                        "step": _global_step(state),
                                        "metrics": metrics or {}}),
            ),
        )
        if is_best:
            self.best_mgr.save(
                epoch,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(state),
                    meta=ocp.args.JsonSave({"epoch": epoch,
                                            "metrics": metrics or {}}),
                ),
            )
            if jax.process_index() == 0:
                with open(os.path.join(self.dir, BEST_STEP_FILENAME), "w") as f:
                    json.dump({"epoch": epoch, "metrics": metrics or {}}, f)

    def save_step(self, state, *, epoch: int, step_in_epoch: int):
        """Mid-epoch save, keyed by global step (exact-resume support)."""
        self.step_mgr.save(
            _global_step(state),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": epoch,
                                        "step": _global_step(state),
                                        "step_in_epoch": step_in_epoch,
                                        "metrics": {}}),
            ),
        )

    def restore_latest(self, state_template):
        """Restore the most recent save across the epoch AND step stores.

        Returns ``(state, meta)``; ``meta['step_in_epoch']`` is non-zero iff
        the save was mid-epoch (resume inside that epoch at that offset).
        Epoch-boundary saves win ties: a step save at the same global step
        carries no extra progress and the boundary one resumes cleanly.
        """
        candidates = []
        epoch_key = self.mgr.latest_step()
        if epoch_key is not None:
            meta = self._peek_meta(self.mgr, epoch_key)
            candidates.append((meta.get("step", 0), 1, self.mgr, epoch_key))
        step_key = self.step_mgr.latest_step()
        if step_key is not None:
            candidates.append((step_key, 0, self.step_mgr, step_key))
        if not candidates:
            return None, None
        _, _, mgr, key = max(candidates)
        restored = mgr.restore(
            key,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = dict(restored["meta"])
        meta.setdefault("step_in_epoch", 0)
        return restored["state"], meta

    @staticmethod
    def _peek_meta(mgr, key: int) -> dict:
        """Read only the JSON meta of a checkpoint (no tensor restore)."""
        try:
            out = mgr.restore(key, args=ocp.args.Composite(
                meta=ocp.args.JsonRestore()))
            return dict(out["meta"])
        except Exception:
            return {}

    def restore(self, state_template, epoch: int | None = None):
        """Restore latest (or given epoch / recorded best) into the template.

        A recorded best epoch may have been garbage-collected by the
        ``max_to_keep`` policy; fall back to the latest retained checkpoint
        rather than failing.
        """
        mgr = self.mgr
        steps = set(mgr.all_steps())
        if epoch is not None and epoch not in steps:
            if epoch in set(self.best_mgr.all_steps()):
                mgr = self.best_mgr  # best slot survived the rolling GC
            else:
                import sys

                print(f"checkpoint epoch {epoch} no longer retained "
                      f"(have {sorted(steps)}); using latest", file=sys.stderr)
                epoch = None
        if epoch is None:
            epoch = mgr.latest_step()
        if epoch is None:
            return None, None
        restored = mgr.restore(
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

    def best_metrics(self) -> dict:
        """Metrics recorded with the best checkpoint ({} if none yet)."""
        path = os.path.join(self.dir, BEST_STEP_FILENAME)
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f).get("metrics", {})

    def load_config(self) -> Config | None:
        path = os.path.join(self.dir, CONFIG_FILENAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            cfg = config_from_json(f.read())
        from ..utils.config import MODEL_VERSION

        if cfg.model.model_version == 0:
            # Field-less config: written before model_version existed, which
            # does NOT pin it either side of the stem-padding fix.
            import warnings

            warnings.warn(
                f"checkpoint in {self.dir} predates the model_version "
                f"field; if it was trained before the hourglass "
                "stem-padding parity fix its numerics differ from the "
                f"current graph (v{MODEL_VERSION})", stacklevel=2)
        elif cfg.model.model_version < MODEL_VERSION:
            import warnings

            warnings.warn(
                f"checkpoint in {self.dir} was trained with model graph "
                f"v{cfg.model.model_version} (current v{MODEL_VERSION}): it "
                "loads structurally but its numerics predate the hourglass "
                "stem-padding parity fix — expect degraded accuracy; retrain "
                "for current-version numerics", stacklevel=2)
        return cfg

    def wait(self):
        self.mgr.wait_until_finished()
        self.best_mgr.wait_until_finished()
        self.step_mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
        self.best_mgr.close()
        self.step_mgr.close()


def _global_step(state) -> int:
    import numpy as np

    return int(np.asarray(jax.device_get(state.step)))


def load_config_from_dir(out_dir: str) -> Config:
    path = os.path.join(out_dir, CONFIG_FILENAME)
    with open(path) as f:
        return config_from_json(f.read())
