"""Device-resident dataset mode (data/resident.py + resident train steps).

Covers: shard layout + on-device gather row fidelity, numeric equivalence
with the streaming step on identical rows, deterministic/resumable epoch
index streams, the k-step scan path, the 'auto' fit gate, and Trainer
integration end-to-end.
"""

import jax
import numpy as np
import pytest

from dsnt_pose2d_tpu.data import ArrayDataset, make_synthetic_mpii
from dsnt_pose2d_tpu.data.resident import (
    ResidentTrainData,
    resident_arrays,
    resident_fits,
    resident_nbytes,
)
from dsnt_pose2d_tpu.models.factory import build_pose_model
from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from dsnt_pose2d_tpu.train.loop import (
    _make_resident_gather,
    make_resident_multi_step,
    make_resident_step,
    make_step_fns,
)
from dsnt_pose2d_tpu.train.state import create_train_state
from dsnt_pose2d_tpu.utils.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _cfg(batch, resident="off", k=1, donate=False):
    return Config(
        model=ModelConfig(base="hg1", reg="js", hg_features=32, hg_depth=2,
                          input_size=32, dtype="float32", use_pallas=False),
        optim=OptimConfig(lr=1e-3, schedule="constant"),
        data=DataConfig(mean=(0, 0, 0), std=(1, 1, 1),
                        device_resident=resident),
        train=TrainConfig(batch_size=batch, donate=donate,
                          steps_per_dispatch=k),
    )


def _dataset(n, seed=3):
    return ArrayDataset(make_synthetic_mpii(n, canvas_size=32, seed=seed))


def _global_rows(rd, host_idx):
    """Map a host-side (B,) shard-local index vector to dataset rows."""
    bs = rd.shard_batch_size
    return np.asarray([rd.dataset_row(pos // bs, local)
                       for pos, local in enumerate(np.asarray(host_idx))])


def test_resident_gather_rows_match_dataset():
    # 19 samples over 8 shards: strided layout, 5 shards of 3 + 3 of 2 rows.
    ds = _dataset(19)
    mesh = make_mesh(8)
    rd = ResidentTrainData(ds, 8, mesh, seed=7)
    assert rd.rows_per_shard == 3
    assert rd.steps_per_epoch == 2  # min shard holds 2 valid rows
    gather = jax.jit(_make_resident_gather(mesh))

    streams = rd._shard_streams(0)
    host_idx = streams[:, :1].reshape(-1)
    out = jax.device_get(gather(rd.resident, rd._put_idx(host_idx)))
    rows = _global_rows(rd, host_idx)
    for k in ds.arrays:
        np.testing.assert_array_equal(out[k], ds.arrays[k][rows], err_msg=k)


def test_resident_pad_rows_never_sampled():
    ds = _dataset(19)
    rd = ResidentTrainData(ds, 8, make_mesh(8), seed=0)
    for epoch in range(3):
        streams = rd._shard_streams(epoch)
        for s in range(rd.num_shards):
            assert streams[s].max() < rd.shard_valid[s]


def test_resident_step_matches_streaming_on_same_rows():
    ds = _dataset(24)
    mesh = make_mesh(8)
    cfg = _cfg(8)
    model = build_pose_model(cfg.model)
    rd = ResidentTrainData(ds, 8, mesh, seed=1)

    def fresh_state(m):
        st = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                batch_size=2)
        return jax.device_put(st, replicated(m))

    streams = rd._shard_streams(0)
    host_idx = streams[:, :rd.shard_batch_size].reshape(-1)
    rows = _global_rows(rd, host_idx)

    res_step = make_resident_step(model, cfg, mesh)
    st_r, m_r = res_step(fresh_state(mesh), rd.resident,
                         rd._put_idx(host_idx))

    train_step, _ = make_step_fns(model, cfg, mesh)
    batch = shard_batch(mesh, {k: v[rows] for k, v in ds.arrays.items()})
    st_s, m_s = train_step(fresh_state(mesh), batch)

    np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        jax.device_get(st_r.params), jax.device_get(st_s.params))


def test_resident_epoch_stream_deterministic_and_resumable():
    rd = ResidentTrainData(_dataset(64), 8, make_mesh(8), seed=5)
    full = [np.asarray(jax.device_get(i)) for i in rd.epoch(2)]
    again = [np.asarray(jax.device_get(i)) for i in rd.epoch(2)]
    tail = [np.asarray(jax.device_get(i)) for i in rd.epoch(2, start_step=3)]
    assert len(full) == rd.steps_per_epoch
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(full[3:], tail):
        np.testing.assert_array_equal(a, b)
    # Different epochs reshuffle.
    other = [np.asarray(jax.device_get(i)) for i in rd.epoch(3)]
    assert any(not np.array_equal(a, b) for a, b in zip(full, other))


def test_resident_epoch_groups_match_flat_stream():
    rd = ResidentTrainData(_dataset(56), 8, make_mesh(8), seed=9)
    flat = [np.asarray(jax.device_get(i)) for i in rd.epoch(0)]
    grouped = list(rd.epoch_groups(0, k=3))
    rebuilt = []
    for kind, idx in grouped:
        arr = np.asarray(jax.device_get(idx))
        if kind == "multi":
            assert arr.shape[0] == 3
            rebuilt.extend(list(arr))
        else:
            rebuilt.append(arr)
    assert len(rebuilt) == len(flat)
    for a, b in zip(flat, rebuilt):
        np.testing.assert_array_equal(a, b)


def test_resident_multi_step_equals_sequential():
    import dataclasses

    ds = _dataset(48)
    mesh = make_mesh(8)
    # SGD for the param comparison: RMSProp's 1/(sqrt(nu)+eps) amplifies
    # fp32 scan-vs-eager reassociation noise ~1e4x on near-zero second
    # moments, making param equality ill-conditioned (losses still pin the
    # batch/forward equivalence under any optimizer).
    cfg = _cfg(8, k=2)
    cfg = dataclasses.replace(cfg, optim=dataclasses.replace(
        cfg.optim, optimizer="sgd", schedule="constant"))
    model = build_pose_model(cfg.model)
    rd = ResidentTrainData(ds, 8, mesh, seed=2)

    def fresh_state():
        st = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                batch_size=2)
        return jax.device_put(st, replicated(mesh))

    (kind, idx_k), = [g for g in rd.epoch_groups(0, k=2)][:1]
    assert kind == "multi"
    multi = make_resident_multi_step(model, cfg, mesh)
    st_m, ms = multi(fresh_state(), rd.resident, idx_k)

    single = make_resident_step(model, cfg, mesh)
    st_1 = fresh_state()
    host = np.asarray(jax.device_get(idx_k))
    losses = []
    for i in range(2):
        st_1, m = single(st_1, rd.resident, rd._put_idx(host[i]))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(np.asarray(jax.device_get(ms["loss"])),
                               np.asarray(losses), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        jax.device_get(st_m.params), jax.device_get(st_1.params))


def test_resident_fit_gate(monkeypatch):
    ds = _dataset(16)
    mesh = make_mesh(8)
    assert resident_arrays(ds) is not None
    assert resident_nbytes(ds) > 0
    assert resident_fits(ds, mesh)
    monkeypatch.setenv("DSNT_RESIDENT_BUDGET_BYTES", "1")
    assert not resident_fits(ds, mesh)


def test_resident_rejects_undivisible_batch():
    with pytest.raises(ValueError):
        ResidentTrainData(_dataset(16), 12, make_mesh(8))


def test_trainer_auto_resident_trains(tmp_path):
    from dsnt_pose2d_tpu.data.loader import ShardedLoader
    from dsnt_pose2d_tpu.train.loop import Trainer

    cfg = _cfg(8, resident="auto", donate=True)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=2,
                                       eval_every_epochs=10))
    model = build_pose_model(cfg.model)
    mesh = make_mesh(8)
    train_ds = _dataset(32)
    loader = ShardedLoader(train_ds, 8, shuffle=True, seed=0)
    tr = Trainer(model=model, cfg=cfg, mesh=mesh, train_loader=loader)
    assert tr.resident is not None          # auto turned it on
    assert tr.resident_step is not None and tr.multi_step is None
    state, _ = tr.run()
    assert int(jax.device_get(state.step)) == 2 * tr.resident.steps_per_epoch


def test_trainer_resident_off_keeps_streaming():
    from dsnt_pose2d_tpu.data.loader import ShardedLoader
    from dsnt_pose2d_tpu.train.loop import Trainer

    cfg = _cfg(8, resident="off")
    model = build_pose_model(cfg.model)
    tr = Trainer(model=model, cfg=cfg, mesh=make_mesh(8),
                 train_loader=ShardedLoader(_dataset(32), 8, shuffle=True,
                                            seed=0))
    assert tr.resident is None and tr.resident_step is None


# ---------------------------------------------------------------------------
# Resident EVAL path (ResidentEvalData + run_evaluation_resident)
# ---------------------------------------------------------------------------


def _eval_state(cfg, model):
    return jax.device_put(
        create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                           batch_size=8, epochs=1),
        replicated(make_mesh(8)))


def test_resident_eval_matches_streaming_counts():
    """PCKh counts are EXACTLY equal between the streaming eval pass and the
    resident one on the same split — every row once, pads excluded."""
    from dsnt_pose2d_tpu.data.loader import ShardedLoader
    from dsnt_pose2d_tpu.data.resident import ResidentEvalData
    from dsnt_pose2d_tpu.train.loop import (
        make_eval_fn,
        make_resident_eval_step,
        run_evaluation,
        run_evaluation_resident,
    )

    cfg = _cfg(8)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(8)
    ds = _dataset(19)  # ragged: 8 shards of 3/2 rows + a ragged final batch
    state = _eval_state(cfg, model)

    loader = ShardedLoader(ds, 8, shuffle=False, drop_last=False)
    stream = run_evaluation(make_eval_fn(model, cfg, mesh), state, mesh,
                            loader, cfg.model.num_joints)

    res = ResidentEvalData(ds, 8, mesh)
    assert res.steps_per_epoch == 3  # ceil(3 rows/shard / 1 per-shard batch)
    resident = run_evaluation_resident(
        make_resident_eval_step(model, cfg, mesh), state, res,
        cfg.model.num_joints)

    se, re_ = stream["evaluator"], resident["evaluator"]
    np.testing.assert_array_equal(se.correct, re_.correct)
    np.testing.assert_array_equal(se.total, re_.total)
    assert stream["pckh"] == resident["pckh"]
    # Sum of per-sample joints counted must equal the real split's visible
    # joints (no pad row leaked in, no real row dropped).
    assert int(re_.total.sum()) == int(
        np.asarray(resident_arrays(ds)["mask"]).sum())

    # The single-dispatch scan variant (what the Trainer's in-training eval
    # uses) must match the per-step passes bit for bit too.
    from dsnt_pose2d_tpu.train.loop import (make_resident_eval_scan,
                                            run_evaluation_resident_scan)

    scanned = run_evaluation_resident_scan(
        make_resident_eval_scan(model, cfg, mesh), state, res,
        cfg.model.num_joints)
    sc = scanned["evaluator"]
    np.testing.assert_array_equal(se.correct, sc.correct)
    np.testing.assert_array_equal(se.total, sc.total)
    assert scanned["pckh"] == stream["pckh"]
    np.testing.assert_allclose(scanned["loss"], resident["loss"], rtol=1e-6)


def test_resident_eval_host_rows_layout():
    from dsnt_pose2d_tpu.data.resident import ResidentEvalData

    ds = _dataset(19)
    res = ResidentEvalData(ds, 8, make_mesh(8))
    rows0 = res.host_rows(0)
    # Step 0, per-shard batch of 1: position s holds shard s's first row,
    # which under the strided layout is dataset row s.
    np.testing.assert_array_equal(rows0, np.arange(8))
    # Final step: shards whose rows ran out repeat their last valid row.
    rows_last = res.host_rows(res.steps_per_epoch - 1)
    assert rows_last.max() < len(ds)


def test_trainer_auto_stages_val_resident(tmp_path):
    from dsnt_pose2d_tpu.data.loader import ShardedLoader
    from dsnt_pose2d_tpu.train.loop import Trainer

    import dataclasses

    cfg = _cfg(8, resident="auto", donate=True)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=1,
                                       eval_every_epochs=1))
    model = build_pose_model(cfg.model)
    mesh = make_mesh(8)
    train_loader = ShardedLoader(_dataset(32), 8, shuffle=True, seed=0)
    val_loader = ShardedLoader(_dataset(16, seed=5), 8, shuffle=False,
                               drop_last=False)
    tr = Trainer(model=model, cfg=cfg, mesh=mesh, train_loader=train_loader,
                 val_loader=val_loader)
    assert tr.resident is not None and tr.val_resident is not None
    _, best = tr.run()
    assert 0.0 <= best <= 1.0


def test_val_resident_budget_charges_train_split(monkeypatch):
    """'auto' declines the val split when train residency already spent the
    budget (and keeps the train split staged)."""
    from dsnt_pose2d_tpu.data.loader import ShardedLoader
    from dsnt_pose2d_tpu.train.loop import Trainer

    train_ds, val_ds = _dataset(32), _dataset(16, seed=5)
    per_dev_train = resident_nbytes(train_ds) // 8
    need_val = (resident_nbytes(train_ds) + resident_nbytes(val_ds)) // 8
    monkeypatch.setenv("DSNT_RESIDENT_BUDGET_BYTES",
                       str((per_dev_train + need_val) // 2))
    cfg = _cfg(8, resident="auto")
    tr = Trainer(model=build_pose_model(cfg.model), cfg=cfg,
                 mesh=make_mesh(8),
                 train_loader=ShardedLoader(train_ds, 8, shuffle=True),
                 val_loader=ShardedLoader(val_ds, 8, shuffle=False,
                                          drop_last=False))
    assert tr.resident is not None      # train fits alone
    assert tr.val_resident is None      # train+val exceeds the budget
