"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md
section 4 item (c)): mesh construction, batch sharding, DP train step
equivalence across mesh sizes, and the driver's dryrun_multichip path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu.data import make_synthetic_mpii
from dsnt_pose2d_tpu.models.factory import build_pose_model
from dsnt_pose2d_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from dsnt_pose2d_tpu.train.loop import make_step_fns
from dsnt_pose2d_tpu.train.state import create_train_state
from dsnt_pose2d_tpu.utils.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _cfg(batch):
    return Config(
        model=ModelConfig(base="hg1", reg="js", hg_features=32, hg_depth=2,
                          input_size=32, dtype="float32", use_pallas=False),
        optim=OptimConfig(lr=1e-3, schedule="constant"),
        data=DataConfig(mean=(0, 0, 0), std=(1, 1, 1)),
        train=TrainConfig(batch_size=batch, donate=False),
    )


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape["model"] == 2 and mesh2.shape[DATA_AXIS] == 4


def test_batch_is_sharded_over_devices():
    mesh = make_mesh(8)
    data = make_synthetic_mpii(8, canvas_size=32, seed=0)
    batch = shard_batch(mesh, data)
    sh = batch["canvases"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), batch["canvases"].ndim)
    # Each device holds 1/8 of the batch.
    shard_shapes = {s.data.shape for s in batch["canvases"].addressable_shards}
    assert shard_shapes == {(1, 32, 32, 3)}


@pytest.mark.slow
def test_train_step_equivalent_1_vs_8_devices():
    # The DP code path must be a pure config change: same data, same seed,
    # same initial params => same loss on mesh(1) and mesh(8).
    data = make_synthetic_mpii(8, canvas_size=32, seed=1)
    losses = {}
    for n in (1, 8):
        cfg = _cfg(8)
        model = build_pose_model(cfg.model)
        mesh = make_mesh(n)
        train_step, _ = make_step_fns(model, cfg, mesh)
        state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                   batch_size=2)
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(mesh, data)
        state, metrics = train_step(state, batch)
        state, metrics = train_step(state, batch)
        losses[n] = float(jax.device_get(metrics["loss"]))
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4)


def test_eval_psum_counts_match_single_device():
    data = make_synthetic_mpii(8, canvas_size=32, seed=2)
    counts = {}
    for n in (1, 8):
        cfg = _cfg(8)
        model = build_pose_model(cfg.model)
        mesh = make_mesh(n)
        _, eval_step = make_step_fns(model, cfg, mesh)
        state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                   batch_size=2)
        state = jax.device_put(state, replicated(mesh))
        out = eval_step(state, shard_batch(mesh, data))
        counts[n] = (np.asarray(jax.device_get(out["pckh_correct"])),
                     np.asarray(jax.device_get(out["pckh_total"])))
    np.testing.assert_allclose(counts[1][1], counts[8][1])
    np.testing.assert_allclose(counts[1][0], counts[8][0])


def test_tensor_parallel_state_is_sharded():
    # The 'model' axis is real (round-4): conv kernels carry a
    # P(..., 'model') annotation, 1-D batch-norm/bias leaves stay replicated,
    # and the optimizer mirrors inherit the kernel layout purely by shape.
    from dsnt_pose2d_tpu.train.loop import state_sharding_for

    cfg = _cfg(8)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(8, model_parallel=2)
    ssh = state_sharding_for(model, cfg, mesh)
    stem = ssh.params["backbone"]["stem_conv"]["kernel"]
    assert stem.spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert ssh.params["backbone"]["stem_bn"]["scale"].spec == jax.sharding.PartitionSpec()
    opt_specs = {s.spec for s in jax.tree_util.tree_leaves(
        ssh.opt_state, is_leaf=lambda x: hasattr(x, "spec"))}
    assert jax.sharding.PartitionSpec(None, None, None, "model") in opt_specs


@pytest.mark.slow
def test_tensor_parallel_step_matches_dp():
    # TP must be a pure layout change: same data, same init => same loss and
    # same updated params as the replicated DP run (up to reduction order).
    from dsnt_pose2d_tpu.train.loop import state_sharding_for

    data = make_synthetic_mpii(8, canvas_size=32, seed=3)
    results = {}
    for tp in (1, 2):
        cfg = _cfg(8)
        model = build_pose_model(cfg.model)
        mesh = make_mesh(8, model_parallel=tp)
        train_step, eval_step = make_step_fns(model, cfg, mesh)
        state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                   batch_size=2)
        state = jax.device_put(state, state_sharding_for(model, cfg, mesh))
        if tp > 1:  # really partitioned, not a silently-replicated no-op
            k = state.params["backbone"]["stem_conv"]["kernel"]
            assert {s.data.shape[-1] for s in k.addressable_shards} == \
                {k.shape[-1] // tp}
        batch = shard_batch(mesh, data)
        state, metrics = train_step(state, batch)
        ev = eval_step(state, batch)
        results[tp] = (
            float(jax.device_get(metrics["loss"])),
            np.asarray(jax.device_get(state.params["backbone"]["stem_conv"]["kernel"])),
            np.asarray(jax.device_get(ev["pckh_total"])),
        )
    np.testing.assert_allclose(results[1][0], results[2][0], rtol=2e-4)
    # Param tolerance: conv-channel psum reduction order differs under TP and
    # RMSProp's 1/(sqrt(nu)+eps) amplifies it early in training (observed
    # max |delta| ~4e-5 on 1/9408 elements); a real sharding bug is O(1).
    np.testing.assert_allclose(results[1][1], results[2][1], atol=2e-4)
    np.testing.assert_allclose(results[1][2], results[2][2])


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    # Tiny scale keeps the suite fast; the DRIVER-DEFAULT flagship scale
    # is timed cold-cache by tests/test_dryrun_budget.py (the round-3
    # regression was exactly this tiny/flagship CI gap).
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(__file__), "..",
                               "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8, scale="tiny")
