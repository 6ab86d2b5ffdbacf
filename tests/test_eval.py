"""PCKh evaluator tests (reference style): synthetic predictions with known
distances vs thresholds; group/total accounting; mask handling."""

import numpy as np

from dsnt_pose2d_tpu.evaluation import JOINT_GROUPS, PCKhEvaluator, pckh_batch_counts


def test_batch_counts_threshold():
    gt = np.zeros((2, 16, 2), np.float32)
    pred = np.zeros((2, 16, 2), np.float32)
    pred[0, 0] = [3.0, 4.0]   # dist 5
    pred[1, 1] = [0.6, 0.8]   # dist 1
    mask = np.ones((2, 16), np.float32)
    head = np.asarray([8.0, 8.0], np.float32)  # threshold 0.5*8 = 4
    correct, total = pckh_batch_counts(pred, gt, mask, head)
    correct, total = np.asarray(correct), np.asarray(total)
    assert total[0] == 2 and correct[0] == 1   # joint 0: one sample failed
    assert correct[1] == 2                      # dist 1 <= 4
    assert correct.sum() == 31                  # 32 joints - 1 failure


def test_mask_excludes_joints():
    gt = np.zeros((1, 16, 2), np.float32)
    pred = np.full((1, 16, 2), 100.0, np.float32)
    mask = np.zeros((1, 16), np.float32)
    mask[0, 3] = 1.0
    correct, total = pckh_batch_counts(pred, gt, mask, np.asarray([1.0]))
    assert np.asarray(total).sum() == 1
    assert np.asarray(correct).sum() == 0


def test_evaluator_accumulates_and_groups():
    ev = PCKhEvaluator()
    gt = np.zeros((4, 16, 2), np.float32)
    pred = np.zeros((4, 16, 2), np.float32)
    pred[:, 9] = [10.0, 0.0]  # head_top always wrong (head_len 2 -> thr 1)
    mask = np.ones((4, 16), np.float32)
    ev.add(pred, gt, mask, np.full(4, 2.0, np.float32))
    ev.add(pred, gt, mask, np.full(4, 2.0, np.float32))
    pj = ev.per_joint()
    assert pj[9] == 0.0
    assert pj[0] == 1.0
    groups = ev.groups()
    assert groups["head"] == 0.5       # joints 8 (ok), 9 (wrong)
    assert groups["ankle"] == 1.0
    # MPII-convention total excludes pelvis/thorax: 14 joints, joint 9 wrong.
    np.testing.assert_allclose(ev.total_pckh(), 13 / 14)
    np.testing.assert_allclose(ev.total_pckh_all(), 15 / 16)
    assert "total" in ev.table()


def test_groups_cover_mpii_table():
    ids = sorted(i for g in JOINT_GROUPS.values() for i in g)
    # 7 groups x 2 joints; pelvis(6)/thorax(7) excluded per MPII table convention.
    assert len(ids) == 14
    assert 6 not in ids and 7 not in ids


def test_add_counts_merges():
    ev = PCKhEvaluator()
    ev.add_counts(np.ones(16), np.full(16, 2.0))
    assert ev.total_pckh() == 0.5
