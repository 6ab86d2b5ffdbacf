"""Evaluation: PCKh@0.5 metrics."""

from .pckh import JOINT_GROUPS, PCKhEvaluator, pckh_batch_counts

__all__ = ["JOINT_GROUPS", "PCKhEvaluator", "pckh_batch_counts"]
