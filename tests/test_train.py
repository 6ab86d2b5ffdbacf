"""Train-loop tests: jitted step over a mesh, overfit on the synthetic
fixture (proves the whole graph + gradients), checkpoint round-trip, LR
schedule, optimizer construction."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu.data import ArrayDataset, ShardedLoader, make_synthetic_mpii
from dsnt_pose2d_tpu.models.factory import build_pose_model
from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from dsnt_pose2d_tpu.train.loop import Trainer, make_step_fns
from dsnt_pose2d_tpu.train.metrics import MeanMeter, MetricWriter
from dsnt_pose2d_tpu.train.state import create_train_state, make_lr_schedule, make_optimizer
from dsnt_pose2d_tpu.utils.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    config_from_json,
    config_to_json,
)

TINY_MODEL = ModelConfig(base="hg1", output_strat="dsnt", reg="js",
                         hg_features=32, hg_depth=2, input_size=32,
                         dtype="float32", use_pallas=False)


def tiny_config(**train_kw):
    return Config(
        model=TINY_MODEL,
        optim=OptimConfig(lr=2e-3, schedule="constant"),
        data=DataConfig(mean=(0, 0, 0), std=(1, 1, 1), color_jitter=0.0,
                        max_rotation_deg=10.0, scale_range=(0.9, 1.1)),
        train=TrainConfig(batch_size=8, seed=0, log_every_steps=1,
                          donate=False, **train_kw),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    train_step, eval_step = make_step_fns(model, cfg, mesh)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))
    data = make_synthetic_mpii(8, canvas_size=48, seed=3)
    batch = shard_batch(mesh, data)
    return cfg, model, mesh, train_step, eval_step, state, batch


def test_train_step_runs_and_updates(setup):
    cfg, model, mesh, train_step, eval_step, state, batch = setup
    new_state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1
    # Params changed.
    p0 = jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    p1 = jax.tree_util.tree_leaves(jax.device_get(new_state.params))[0]
    assert not np.allclose(p0, p1)


def test_eval_step_outputs(setup):
    cfg, model, mesh, train_step, eval_step, state, batch = setup
    out = eval_step(state, batch)
    assert out["pckh_correct"].shape == (16,)
    assert out["pckh_total"].shape == (16,)
    assert float(out["pckh_total"].sum()) > 0
    assert np.isfinite(float(out["loss"]))


def test_overfit_synthetic(setup):
    # The end-to-end learning check (SURVEY.md minimum slice): loss must
    # drop substantially on a fixed tiny batch within a few dozen steps.
    cfg, model, mesh, train_step, eval_step, state, batch = setup
    losses = []
    for i in range(60):
        state, metrics = train_step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert all(np.isfinite(l) for l in losses)


def test_trainer_epoch_and_checkpoint(tmp_path):
    cfg = tiny_config(epochs=1, eval_every_epochs=1)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    ds = ArrayDataset(make_synthetic_mpii(16, canvas_size=48, seed=4))
    train_loader = ShardedLoader(ds, 8, shuffle=True, seed=0)
    val_loader = ShardedLoader(ds, 8, shuffle=False, drop_last=False)

    from dsnt_pose2d_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "exp"), cfg, max_to_keep=2)
    writer = MetricWriter(str(tmp_path / "exp"), echo=False)
    trainer = Trainer(model=model, cfg=cfg, mesh=mesh,
                      train_loader=train_loader, val_loader=val_loader,
                      checkpointer=ckpt, metric_writer=writer)
    state, best = trainer.run()
    assert 0.0 <= best <= 1.0
    assert os.path.exists(tmp_path / "exp" / "config.json")
    assert os.path.exists(tmp_path / "exp" / "metrics.jsonl")

    # Round-trip: restore into a fresh template and compare a param leaf.
    template = trainer.init_state()
    restored, meta = ckpt.restore(template)
    assert restored is not None
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))[0]
    np.testing.assert_allclose(a, b)
    # Restored config rebuilds the same model.
    cfg2 = ckpt.load_config()
    assert cfg2.model == cfg.model
    ckpt.close()


def test_lr_schedule_step_decay():
    sched = make_lr_schedule(OptimConfig(lr=1.0, lr_drop_epochs=(2, 4),
                                         lr_drop_factor=0.1), steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(25)) == pytest.approx(0.1)
    assert float(sched(45)) == pytest.approx(0.01)


def test_optimizer_kinds():
    for kind in ("rmsprop", "adam", "sgd"):
        make_optimizer(OptimConfig(optimizer=kind))
    with pytest.raises(ValueError):
        make_optimizer(OptimConfig(optimizer="lbfgs"))


def test_config_json_roundtrip():
    cfg = tiny_config()
    s = config_to_json(cfg)
    cfg2 = config_from_json(s)
    assert cfg2 == cfg


def test_model_version_legacy_configs_flagged(tmp_path):
    # Configs written before the model_version field deserialize as v0 =
    # UNKNOWN vintage (the stem-padding fix landed before the field did, so
    # field-less does not pin the numerics) and loading warns tentatively;
    # an EXPLICIT old version warns definitively (ADVICE r2).
    import json

    from dsnt_pose2d_tpu.train.checkpoint import CheckpointManager
    from dsnt_pose2d_tpu.utils.config import MODEL_VERSION

    assert tiny_config().model.model_version == MODEL_VERSION
    d = json.loads(config_to_json(tiny_config()))
    del d["model"]["model_version"]
    legacy = config_from_json(json.dumps(d))
    assert legacy.model.model_version == 0

    (tmp_path / "config.json").write_text(json.dumps(d))
    with pytest.warns(UserWarning, match="predates the model_version field"):
        cfg = CheckpointManager(str(tmp_path)).load_config()
    assert cfg.model.model_version == 0

    d["model"]["model_version"] = 1
    (tmp_path / "config.json").write_text(json.dumps(d))
    with pytest.warns(UserWarning, match="expect degraded accuracy"):
        cfg = CheckpointManager(str(tmp_path)).load_config()
    assert cfg.model.model_version == 1


def test_mean_meter():
    m = MeanMeter()
    m.add(1.0)
    m.add(3.0)
    assert m.value == 2.0
    m.reset()
    assert m.n == 0


def test_prefetch_to_device():
    from dsnt_pose2d_tpu.data.loader import prefetch_to_device

    mesh = make_mesh(1)
    ds = ArrayDataset(make_synthetic_mpii(8, canvas_size=16, seed=5))
    loader = ShardedLoader(ds, 4, shuffle=False)
    batches = list(prefetch_to_device(loader.epoch(0), mesh))
    assert len(batches) == 2
    assert hasattr(batches[0]["canvases"], "sharding")


def test_trainer_writes_sample_renders(tmp_path):
    cfg = tiny_config(epochs=1, eval_every_epochs=1)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    ds = ArrayDataset(make_synthetic_mpii(8, canvas_size=48, seed=6))
    train_loader = ShardedLoader(ds, 8, shuffle=True, seed=0)
    val_loader = ShardedLoader(ds, 8, shuffle=False, drop_last=False)
    writer = MetricWriter(str(tmp_path / "exp"), echo=False)
    trainer = Trainer(model=model, cfg=cfg, mesh=mesh,
                      train_loader=train_loader, val_loader=val_loader,
                      metric_writer=writer)
    trainer.run()
    import glob

    pngs = glob.glob(str(tmp_path / "exp" / "samples" / "*.png"))
    assert pngs, "expected sample skeleton renders"


def test_flip_eval_consistency():
    # On a horizontally symmetric evaluation, flip-averaged coords must stay
    # valid and close to the single-pass decode for a near-uniform model.
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             flip_eval=True))
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    _, eval_step = make_step_fns(model, cfg, mesh)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))
    data = make_synthetic_mpii(8, canvas_size=48, seed=7)
    out = eval_step(state, shard_batch(mesh, data))
    assert np.all(np.isfinite(np.asarray(jax.device_get(out["pred_orig"]))))
    assert float(out["pckh_total"].sum()) > 0


def test_multi_scale_eval():
    # SURVEY C16 multi-scale averaging: (1.0,) must be bit-identical to the
    # default single pass; duplicate scales average identical predictions
    # (still identical up to the sum/len arithmetic); a real scale set runs,
    # stays finite, and leaves the loss (always canonical-pass) unchanged.
    import dataclasses

    cfg = tiny_config()
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(mesh, make_synthetic_mpii(8, canvas_size=48, seed=7))

    def run(scales):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, eval_scales=scales))
        _, eval_step = make_step_fns(model, c, mesh)
        return jax.device_get(eval_step(state, batch))

    base = run((1.0,))
    dup = run((1.0, 1.0))
    multi = run((0.9, 1.0, 1.1))

    np.testing.assert_array_equal(base["pred_orig"], dup["pred_orig"])
    assert float(base["loss"]) == float(multi["loss"])  # canonical-pass loss
    assert np.all(np.isfinite(multi["pred_orig"]))
    assert not np.array_equal(base["pred_orig"], multi["pred_orig"])
    # The scaled crops look at the same person: averaged predictions stay in
    # the same neighborhood as the canonical ones (canvas px, generous bound).
    assert float(np.median(np.abs(multi["pred_orig"] - base["pred_orig"]))) < 24


def test_multi_step_matches_sequential():
    import dataclasses

    from dsnt_pose2d_tpu.train.loop import make_multi_step

    # SGD: RMSProp's rsqrt amplifies benign fp-reassociation differences
    # between the scanned and sequential compilations ~1e-2 by step 3; with
    # SGD the equivalence of the scan mechanics is checkable tightly.
    cfg = dataclasses.replace(tiny_config(),
                              optim=OptimConfig(lr=1e-2, optimizer="sgd",
                                                schedule="constant"))
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    train_step, _ = make_step_fns(model, cfg, mesh)
    multi = make_multi_step(model, cfg, mesh)

    def fresh_state():
        s = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
        return jax.device_put(s, replicated(mesh))

    k = 3
    batches = [make_synthetic_mpii(8, canvas_size=48, seed=10 + i) for i in range(k)]

    # Sequential.
    s1 = fresh_state()
    seq_losses = []
    for b in batches:
        s1, m = train_step(s1, shard_batch(mesh, b))
        seq_losses.append(float(jax.device_get(m["loss"])))

    # Scanned: stack along a leading step axis.
    super_batch = {key: np.stack([np.asarray(b[key]) for b in batches])
                   for key in batches[0]}
    s2 = fresh_state()
    s2, ms = multi(s2, jax.device_put(super_batch))
    scan_losses = [float(x) for x in np.asarray(jax.device_get(ms["loss"]))]

    # Step 1 is bit-tight; later steps accumulate benign fp-reassociation
    # differences between the scanned and sequential compilations.
    np.testing.assert_allclose(scan_losses[0], seq_losses[0], rtol=2e-6)
    np.testing.assert_allclose(scan_losses, seq_losses, rtol=3e-4)
    a = jax.tree_util.tree_leaves(jax.device_get(s1.params))[0]
    b = jax.tree_util.tree_leaves(jax.device_get(s2.params))[0]
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_streaming_dispatch_clamped_to_single_step():
    # steps_per_dispatch>1 is resident-only: on the streaming input path the
    # grouped dispatch is measured strictly slower than k=1
    # (docs/bench_streaming.json), so the Trainer must not build the k-step
    # graph when residency is off — while the resident path keeps it.
    import dataclasses

    cfg = tiny_config(epochs=1, steps_per_dispatch=4)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    ds = ArrayDataset(make_synthetic_mpii(16, canvas_size=48, seed=8))

    off = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, device_resident="off"))
    t_stream = Trainer(model=model, cfg=off, mesh=mesh,
                       train_loader=ShardedLoader(ds, 8, shuffle=True, seed=0))
    assert t_stream.resident is None
    assert t_stream.multi_step is None            # clamped
    assert t_stream.resident_multi is None

    on = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, device_resident="on"))
    t_res = Trainer(model=model, cfg=on, mesh=mesh,
                    train_loader=ShardedLoader(ds, 8, shuffle=True, seed=0))
    assert t_res.resident is not None
    assert t_res.resident_multi is not None       # k kept for resident


def test_trainer_steps_per_dispatch(tmp_path):
    import dataclasses

    cfg = tiny_config(epochs=1, eval_every_epochs=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_dispatch=2,
                                       donate=True))
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    # 5 batches of 8 from 40 samples: two scan dispatches + one ragged single.
    ds = ArrayDataset(make_synthetic_mpii(40, canvas_size=48, seed=8))
    train_loader = ShardedLoader(ds, 8, shuffle=True, seed=0)
    val_loader = ShardedLoader(ds, 8, shuffle=False, drop_last=False)
    trainer = Trainer(model=model, cfg=cfg, mesh=mesh,
                      train_loader=train_loader, val_loader=val_loader)
    state, best = trainer.run()
    assert int(jax.device_get(state.step)) == 5
    assert 0.0 <= best <= 1.0


def test_eval_driver_matches_trainer_eval(setup):
    # EvalDriver (evaluate/infer CLI path) must produce the same results as
    # Trainer.evaluate without building any train-step machinery.
    from dsnt_pose2d_tpu.train.loop import EvalDriver, run_evaluation

    cfg, model, mesh, train_step, eval_step, state, batch = setup
    ds = ArrayDataset(make_synthetic_mpii(16, canvas_size=48, seed=9))
    loader = ShardedLoader(ds, 8, shuffle=False, drop_last=False)
    driver = EvalDriver(model=model, cfg=cfg, mesh=mesh, loader=loader)
    assert not hasattr(driver, "train_step")
    res_driver = driver.evaluate(state)
    res_ref = run_evaluation(eval_step, state, mesh, loader,
                             model.cfg.num_joints)
    np.testing.assert_allclose(res_driver["pckh"], res_ref["pckh"])
    np.testing.assert_allclose(res_driver["loss"], res_ref["loss"], rtol=1e-6)
    # predict() covers every sample, in loader order.
    preds = driver.predict(state)
    assert preds.shape == (16, 16, 2)
    assert np.all(np.isfinite(preds))
    # The restore template has the Trainer's TrainState structure.
    t1 = jax.tree_util.tree_structure(driver.init_state())
    assert t1 == jax.tree_util.tree_structure(state)


def test_infer_fn_matches_eval_pred_orig(setup):
    # The lean serving graph (make_infer_fn: no loss/PCKh) must reproduce
    # the eval graph's original-space predictions exactly, with and without
    # flip-averaging.
    import dataclasses

    from dsnt_pose2d_tpu.train.loop import make_eval_fn, make_infer_fn

    cfg, model, mesh, train_step, eval_step, state, batch = setup
    pred = make_infer_fn(model, cfg, mesh)(state, batch)
    out = eval_step(state, batch)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(pred)),
        np.asarray(jax.device_get(out["pred_orig"])), rtol=1e-6, atol=1e-5)

    cfg_f = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flip_eval=True))
    pred_f = make_infer_fn(model, cfg_f, mesh)(state, batch)
    out_f = make_eval_fn(model, cfg_f, mesh)(state, batch)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(pred_f)),
        np.asarray(jax.device_get(out_f["pred_orig"])), rtol=1e-6, atol=1e-5)


def test_predict_dataset_order_uneven_batches(setup):
    # predict() must return DATASET-ordered rows and cover every sample even
    # when n doesn't divide the batch (pad rows dropped by index, not tail
    # truncation): a single full-dataset batch is trivially ordered, so
    # predictions with bs=4 (3 batches, padded tail) must match it row-wise.
    from dsnt_pose2d_tpu.train.loop import EvalDriver

    cfg, model, mesh, *_rest = setup
    state = _rest[-2]
    ds = ArrayDataset(make_synthetic_mpii(10, canvas_size=48, seed=11))
    small = EvalDriver(model=model, cfg=cfg, mesh=mesh,
                       loader=ShardedLoader(ds, 4, shuffle=False,
                                            drop_last=False))
    whole = EvalDriver(model=model, cfg=cfg, mesh=mesh,
                       loader=ShardedLoader(ds, 10, shuffle=False,
                                            drop_last=False))
    p_small = small.predict(state)
    p_whole = whole.predict(state)
    assert p_small.shape == (10, 16, 2)
    np.testing.assert_allclose(p_small, p_whole, rtol=1e-4, atol=1e-4)


class _Bomb(Exception):
    pass


class _BombWriter:
    """Metric writer that simulates a preemption after n step-writes."""

    path = None

    def __init__(self, n):
        self.left = n

    def write(self, d):
        if "loss" in d and "train_loss" not in d:
            self.left -= 1
            if self.left == 0:
                raise _Bomb

    def close(self):
        pass


@pytest.mark.slow
def test_mid_epoch_resume_bit_exact(tmp_path):
    # SURVEY section 5 checkpoint plan ("store the loader state"): train k
    # steps, die mid-epoch, resume from the step checkpoint, and match the
    # uninterrupted run's final params BIT-FOR-BIT (augmentation is keyed by
    # the restored global step; the loader replays the index stream offset).
    from dsnt_pose2d_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config(epochs=2, eval_every_epochs=10,
                      checkpoint_every_steps=2)
    ds_data = make_synthetic_mpii(32, canvas_size=48, seed=11)

    def build(ckpt, writer=None):
        model = build_pose_model(cfg.model)
        mesh = make_mesh(1)
        ds = ArrayDataset(ds_data)
        return Trainer(model=model, cfg=cfg, mesh=mesh,
                       train_loader=ShardedLoader(ds, 8, shuffle=True, seed=0),
                       checkpointer=ckpt, metric_writer=writer)

    # Uninterrupted run: 2 epochs x 4 steps.
    trainer_a = build(None)
    state_a, _ = trainer_a.run()
    params_a = jax.device_get(state_a.params)
    assert int(jax.device_get(state_a.step)) == 8

    # Interrupted run: dies after step 3 of epoch 0; the step store holds
    # the step-2 save.
    ckpt = CheckpointManager(str(tmp_path / "exp"), cfg, max_to_keep=2)
    trainer_b = build(ckpt, writer=_BombWriter(3))
    with pytest.raises(_Bomb):
        trainer_b.run()
    ckpt.wait()

    restored, meta = ckpt.restore_latest(trainer_b.init_state())
    assert restored is not None
    assert meta["epoch"] == 0 and meta["step_in_epoch"] == 2
    assert int(jax.device_get(restored.step)) == 2

    trainer_c = build(ckpt)
    state_c, _ = trainer_c.run(restored, start_epoch=meta["epoch"],
                               start_step=meta["step_in_epoch"])
    assert int(jax.device_get(state_c.step)) == 8
    params_c = jax.device_get(state_c.params)
    for a, c in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    ckpt.close()


def test_restore_falls_back_when_best_collected(tmp_path):
    from dsnt_pose2d_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config(epochs=1)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    ckpt = CheckpointManager(str(tmp_path / "exp"), cfg, max_to_keep=2)
    for epoch in range(4):
        ckpt.save(epoch, state, is_best=(epoch == 0),
                  metrics={"val_pckh": 0.5})
    ckpt.wait()
    # Epoch 0 left the rolling store (max_to_keep=2) but survives in the
    # dedicated best slot.
    assert ckpt.best_epoch() == 0
    restored, meta = ckpt.restore(state, epoch=ckpt.best_epoch())
    assert restored is not None
    assert meta["epoch"] == 0  # served from the best store
    # A best-less epoch that was GC'd falls back to latest.
    restored, meta = ckpt.restore(state, epoch=1)
    assert meta["epoch"] == 3
    ckpt.close()
