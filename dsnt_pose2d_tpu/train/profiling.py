"""Profiling hooks (SURVEY.md section 5 tracing posture).

The reference has only coarse `tele` timing meters; here the rebuild wires
``jax.profiler`` in: a Trainer hook that captures a device trace of one full
epoch (the second, so compile noise is excluded) into a directory viewable
with TensorBoard's profile plugin or Perfetto.
"""

from __future__ import annotations

import jax


def make_profile_hook(out_dir: str, epoch_to_trace: int = 1):
    """Trainer hook: trace `epoch_to_trace` (starts at its beginning)."""
    state = {"active": False, "done": False}

    def hook(epoch: int, _train_state, _summary):
        # Called at epoch END: start before the target epoch, stop after it.
        if epoch + 1 == epoch_to_trace and not state["done"] and not state["active"]:
            jax.profiler.start_trace(out_dir)
            state["active"] = True
        elif state["active"]:
            jax.profiler.stop_trace()
            state["active"] = False
            state["done"] = True

    return hook


class annotate(jax.profiler.TraceAnnotation):
    """Named scope for trace timelines: ``with annotate("stack3"): ...``"""
