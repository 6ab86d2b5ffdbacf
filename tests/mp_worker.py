"""Multi-process worker for tests/test_multiprocess.py.

Spawned N times (usually 2) with a local coordinator; each process owns 2
virtual CPU devices, so the mesh assembles 2*N global devices.  Exercises the
ONE code path the virtual-device tests cannot: multi-process global-batch
assembly (``jax.make_array_from_process_local_data``), per-host loader
slicing with ``num_hosts > 1``, and cross-process collectives (gradient
all-reduce, psum'd PCKh counts) over the distributed runtime.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
Prints one JSON line of replicated results; the parent asserts every process
printed the SAME values (replicated state must agree across processes).
"""

import json
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np

    from dsnt_pose2d_tpu.data import ArrayDataset, ShardedLoader, make_synthetic_mpii
    from dsnt_pose2d_tpu.models.factory import build_pose_model
    from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from dsnt_pose2d_tpu.train.loop import make_step_fns
    from dsnt_pose2d_tpu.train.state import create_train_state
    from dsnt_pose2d_tpu.utils.config import (
        Config, DataConfig, ModelConfig, OptimConfig, TrainConfig)

    cfg = Config(
        model=ModelConfig(base="hg1", output_strat="dsnt", reg="js",
                          hg_features=16, hg_depth=2, input_size=32,
                          dtype="float32", use_pallas=False),
        optim=OptimConfig(lr=1e-3, schedule="constant"),
        data=DataConfig(mean=(0, 0, 0), std=(1, 1, 1), color_jitter=0.0),
        train=TrainConfig(batch_size=8, seed=0, donate=False),
    )
    model = build_pose_model(cfg.model)
    mesh = make_mesh()  # all 2*nprocs devices
    train_step, eval_step = make_step_fns(model, cfg, mesh)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))

    # 33 samples (odd) exercises the even-per-host truncation: every host
    # must see 16 samples -> identical step counts, no collective hang.
    ds = ArrayDataset(make_synthetic_mpii(33, canvas_size=48, seed=3))
    loader = ShardedLoader(ds, cfg.train.batch_size, shuffle=True, seed=0,
                           num_hosts=nprocs, host_id=jax.process_index())
    assert loader.steps_per_epoch == 16 // loader.local_batch_size

    losses = []
    pckh = None
    for i, batch in enumerate(loader.epoch(0)):
        global_batch = shard_batch(mesh, batch)
        state, metrics = train_step(state, global_batch)
        losses.append(float(jax.device_get(metrics["loss"])))
        if i == 1:
            out = eval_step(state, global_batch)
            pckh = [float(x) for x in
                    np.asarray(jax.device_get(out["pckh_total"]))]
            break

    # Multi-step dispatch path (steps_per_dispatch=2 lax.scan) across
    # processes: super-batch assembly via shard_super_batch + scanned
    # collective steps must agree on every process.
    from dsnt_pose2d_tpu.train.loop import _prefetch_dispatch_groups, make_multi_step

    multi = make_multi_step(model, cfg, mesh)
    multi_losses = []
    for kind, payload in _prefetch_dispatch_groups(loader.epoch(1), 2, mesh):
        if kind == "multi":
            state, ms = multi(state, payload)
            multi_losses.extend(
                float(x) for x in np.asarray(jax.device_get(ms["loss"])))
        else:
            state, m = train_step(state, payload)
            multi_losses.append(float(jax.device_get(m["loss"])))
        if len(multi_losses) >= 4:
            break

    # Device-resident path across processes: every host stages only its
    # addressable shards (make_array_from_callback), index streams are a
    # pure function of (seed, epoch, shard) so all processes dispatch
    # identical steps; losses must agree.
    from dsnt_pose2d_tpu.data.resident import ResidentTrainData
    from dsnt_pose2d_tpu.train.loop import make_resident_step

    rd = ResidentTrainData(ds, cfg.train.batch_size, mesh, seed=1)
    res_step = make_resident_step(model, cfg, mesh)
    resident_losses = []
    for idx in rd.epoch(0):
        state, m = res_step(state, rd.resident, idx)
        resident_losses.append(float(jax.device_get(m["loss"])))
        if len(resident_losses) >= 2:
            break

    # Dataset-ordered predict() under num_hosts=2 (round-2 VERDICT item 3):
    # rows must cover EVERY sample (odd n, padded tail) and be identical on
    # every process.
    from dsnt_pose2d_tpu.train.loop import EvalDriver

    infer_loader = ShardedLoader(ds, cfg.train.batch_size, shuffle=False,
                                 num_hosts=nprocs,
                                 host_id=jax.process_index(),
                                 drop_last=False)
    driver = EvalDriver(model=model, cfg=cfg, mesh=mesh, loader=infer_loader)
    preds = driver.predict(state)
    assert preds.shape == (33, 16, 2), preds.shape
    assert np.isfinite(preds).all()

    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(state.params)[0]))
    print(json.dumps({
        "process": pid,
        "num_steps_per_epoch": loader.steps_per_epoch,
        "losses": losses,
        "multi_losses": multi_losses,
        "resident_losses": resident_losses,
        "pckh_total": pckh,
        "param_checksum": float(np.sum(np.abs(leaf), dtype=np.float64)),
        "preds_checksum": float(np.sum(np.abs(preds), dtype=np.float64)),
        "preds_row0": [float(x) for x in preds[0].ravel()[:4]],
        "preds_row32": [float(x) for x in preds[32].ravel()[:4]],
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
