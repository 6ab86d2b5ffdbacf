"""PCKh@0.5 evaluation (MPII protocol).

Reference: ``PCKhEvaluator`` in ``dsnt/eval.py`` (SURVEY.md C13, section 7
item 9): a prediction is correct iff its distance to the ground truth in
ORIGINAL-image pixels is <= 0.5 * head segment length (precomputed per sample
in the annotations, MPII convention 0.6 x head-bbox diagonal).  Scores are
reported per joint, per joint-group, and total, over visible joints of the
validation (Tompson) split.

TPU-native shape: the per-batch correctness reduction is a pure jnp function
(`pckh_batch_counts`) that can run inside the jitted eval step and be
``psum``-aggregated across hosts/devices; the Python ``PCKhEvaluator`` mirrors
the reference's meter-accumulator surface on top of it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np



# Reporting groups of the MPII PCKh table.
JOINT_GROUPS = {
    "head": (8, 9),
    "shoulder": (12, 13),
    "elbow": (11, 14),
    "wrist": (10, 15),
    "hip": (2, 3),
    "knee": (1, 4),
    "ankle": (0, 5),
}

# The standard MPII "total" excludes pelvis (6) and thorax (7): it is computed
# over the 14 joints that appear in the reporting groups above.
TOTAL_JOINTS = tuple(sorted(i for g in JOINT_GROUPS.values() for i in g))


def pckh_batch_counts(pred_orig_px: jnp.ndarray, true_orig_px: jnp.ndarray,
                      mask: jnp.ndarray, head_length: jnp.ndarray,
                      threshold: float = 0.5):
    """Per-joint (correct, total) counts for one batch; jit/psum friendly.

    Args:
        pred_orig_px, true_orig_px: (B, J, 2) in original-image pixels.
        mask: (B, J) visibility.
        head_length: (B,) per-sample PCKh normalizer (original px).

    Returns:
        correct (J,), total (J,) float arrays.
    """
    dist = jnp.linalg.norm(pred_orig_px - true_orig_px, axis=-1)
    ok = (dist <= threshold * head_length[:, None]).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    return jnp.sum(ok * mask, axis=0), jnp.sum(mask, axis=0)


class PCKhEvaluator:
    """Accumulates per-joint PCKh meters (reference ``add()`` surface)."""

    def __init__(self, num_joints: int = 16, threshold: float = 0.5):
        self.num_joints = num_joints
        self.threshold = threshold
        self.correct = np.zeros(num_joints)
        self.total = np.zeros(num_joints)
        # Split provenance (e.g. 'val-list' vs 'hash-holdout...'): printed
        # with the table so no PCKh number circulates without its
        # comparability caveat (SURVEY C10/C13).
        self.provenance = ""

    def add(self, pred_coords, true_coords, joint_mask, head_lengths):
        """All inputs in ORIGINAL-image pixel space; shapes as above."""
        c, t = pckh_batch_counts(
            jnp.asarray(pred_coords), jnp.asarray(true_coords),
            jnp.asarray(joint_mask), jnp.asarray(head_lengths), self.threshold)
        self.correct += np.asarray(c)
        self.total += np.asarray(t)

    def add_counts(self, correct, total):
        """Merge pre-reduced (J,) counts (e.g. psum'd across hosts)."""
        self.correct += np.asarray(correct)
        self.total += np.asarray(total)

    def per_joint(self) -> np.ndarray:
        return self.correct / np.maximum(self.total, 1.0)

    def groups(self) -> dict:
        pj = self.per_joint()
        out = {}
        for name, ids in JOINT_GROUPS.items():
            c = sum(self.correct[i] for i in ids)
            t = sum(self.total[i] for i in ids)
            out[name] = c / max(t, 1.0)
        return out

    def total_pckh(self) -> float:
        """MPII-convention total: over the 14 group joints, excluding
        pelvis (6) and thorax (7) — matches the published PCKh tables.
        Falls back to all joints for non-MPII joint counts."""
        ids = [i for i in TOTAL_JOINTS if i < self.num_joints]
        if self.num_joints != 16 or not ids:
            return self.total_pckh_all()
        c = sum(self.correct[i] for i in ids)
        t = sum(self.total[i] for i in ids)
        return float(c / max(t, 1.0))

    def total_pckh_all(self) -> float:
        """Total over ALL joints (including pelvis/thorax)."""
        return float(self.correct.sum() / max(self.total.sum(), 1.0))

    def table(self) -> str:
        lines = ["PCKh@%.1f" % self.threshold]
        for name, v in self.groups().items():
            lines.append(f"  {name:<9s} {100 * v:6.2f}")
        lines.append(f"  {'total':<9s} {100 * self.total_pckh():6.2f}")
        lines.append(f"  {'total16':<9s} {100 * self.total_pckh_all():6.2f}")
        if self.provenance:
            note = ("" if self.provenance.startswith("val-list")
                    else " (NOT comparable to published Tompson-split numbers)")
            lines.append(f"  split: {self.provenance}{note}")
        return "\n".join(lines)

    def reset(self):
        self.correct[:] = 0
        self.total[:] = 0
