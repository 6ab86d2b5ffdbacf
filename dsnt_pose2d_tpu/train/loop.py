"""Jitted train/eval steps over the device mesh + the epoch-loop Trainer.

TPU-native counterpart of the reference's ``train.py`` orchestration
(SURVEY.md L5/section 3.1): one ``jit``-compiled train step — on-device
augmentation, forward, intermediate-supervision loss, backward, RMSProp
update — with the global batch sharded over the ``data`` mesh axis and
parameters replicated.  Gradient all-reduce is emitted by XLA from sharding
propagation (collectives ride ICI); batch-norm statistics are computed over
the GLOBAL batch (an upgrade over per-device torch BN semantics, documented
deviation).  The eval step additionally decodes coordinates, maps them back
to original-image pixels through the inverse crop affine, and reduces PCKh
counts on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import preprocess_batch
from ..data.loader import prefetch_to_device
from ..data.transforms import transform_coords
from ..evaluation.pckh import PCKhEvaluator, pckh_batch_counts
from ..models.factory import PoseModel
from ..parallel.mesh import batch_sharding, replicated, shard_batch
from ..utils.config import Config
from .state import TrainState, create_train_state, make_optimizer

# Maximum executions queued ahead of the oldest un-fetched result in the
# full-pass eval/predict loops.  Each queued execution pins its input batch
# in device HBM, so an unthrottled dispatch of a large split (e.g. infer
# over full MPII at 384px uint8) could stack hundreds of MB of input
# buffers; a small window keeps the pipeline full at a bounded footprint.
_MAX_INFLIGHT = 4


def normalized_to_crop_px(coords_norm: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((coords_norm + 1.0) * size - 1.0) / 2.0


def _dump_samples(sample_dir: str, epoch: int, batch: dict,
                  pred_orig: np.ndarray, max_n: int = 4):
    """Render predicted skeletons over the first few canvases (Showoff-style
    debug images, SURVEY.md C14)."""
    import os

    from ..data.transforms import transform_coords as _tc
    from ..utils.visualization import render_skeleton, save_png

    os.makedirs(sample_dir, exist_ok=True)
    canvases = np.asarray(batch["canvases"])[:max_n]
    m = np.asarray(batch["canvas_from_orig"])[:max_n]
    mask = np.asarray(batch["mask"])[:max_n]
    pred_canvas = np.asarray(_tc(jnp.asarray(m), jnp.asarray(pred_orig[:max_n])))
    for i, canvas in enumerate(canvases):
        img = render_skeleton(canvas, pred_canvas[i], mask[i])
        save_png(img, os.path.join(sample_dir, f"epoch{epoch:04d}_s{i}.png"))


def state_sharding_for(model: PoseModel, cfg: Config, mesh):
    """Sharding (tree) for the TrainState argument of every jitted step.

    Pure data parallelism (no ``model`` mesh axis): one replicated sharding,
    zero overhead.  With ``model_parallel > 1`` the state tree is
    shape-inferred via ``jax.eval_shape`` (no arrays materialize) and every
    feature-bearing leaf gets the tensor-parallel annotation from
    :mod:`dsnt_pose2d_tpu.parallel.tp`; GSPMD partitions the convs/matmuls
    and inserts the collectives from there.
    """
    from ..parallel.tp import state_shardings, tp_size

    if tp_size(mesh) == 1:
        return replicated(mesh)
    shapes = jax.eval_shape(
        lambda: create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                                   batch_size=2))
    return state_shardings(mesh, shapes)


def make_step_fns(model: PoseModel, cfg: Config, mesh,
                  steps_per_epoch: int = 1):
    """Build (train_step, eval_step), jitted with mesh shardings."""
    train_step, eval_step = _build_step_bodies(model, cfg, steps_per_epoch)
    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    bsh = batch_sharding(mesh)
    train_jit = jax.jit(train_step, in_shardings=(ssh, bsh),
                        out_shardings=(ssh, repl),
                        donate_argnums=(0,) if cfg.train.donate else ())
    eval_jit = jax.jit(eval_step, in_shardings=(ssh, bsh),
                       out_shardings=repl)
    return train_jit, eval_jit


def make_eval_fn(model: PoseModel, cfg: Config, mesh):
    """Jitted eval step ONLY — no optimizer, no train graph.

    The evaluate/infer CLIs (reference C16/C17) use this so an hg8 eval-only
    run never pays the train-step XLA compile or builds optimizer state
    machinery beyond the restore template.
    """
    _, eval_step = _build_eval_body(model, cfg)
    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(ssh, bsh), out_shardings=repl)


def make_infer_fn(model: PoseModel, cfg: Config, mesh):
    """Jitted SERVING step: uint8 canvas batch -> original-space coords.

    The inference counterpart of the reference's infer.py forward
    (SURVEY.md C17) stripped to what serving needs — deterministic eval
    preprocess, forward, decode, optional flip-averaging, crop->original
    untransform.  No losses, no PCKh counts, no ground-truth inputs beyond
    the affine metadata; this is the graph `EvalDriver.predict` dispatches
    and the one `tools/bench_infer.py` measures.
    """
    in_size = model.image_specs.size
    data_cfg = cfg.data

    def infer_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds = []
        for s in _eval_scales(cfg):
            pre = preprocess_batch(
                jax.random.PRNGKey(0), batch["canvases"], batch["coords_px"],
                batch["mask"], batch["head_length"], batch["canvas_from_orig"],
                data_cfg, in_size, False,
                canvas_margin=batch.get("canvas_margin"), eval_scale=s)
            _, coords_norm = _decode_averaged(model, cfg, variables,
                                              pre["images"])
            preds.append(_to_original_px(coords_norm, pre["crop_from_orig"],
                                         in_size))
        return sum(preds) / len(preds)

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(infer_step, in_shardings=(ssh, bsh), out_shardings=repl)


def _eval_scales(cfg: Config) -> tuple:
    """The multi-scale-evaluation scale set (SURVEY C16), canonical first."""
    scales = tuple(float(s) for s in (cfg.train.eval_scales or (1.0,)))
    return scales or (1.0,)


def _decode_averaged(model: PoseModel, cfg: Config, variables, images):
    """Forward + coordinate decode, with optional mirrored-pass averaging.

    Returns ``(out, coords_norm)`` where ``out`` is the UNFLIPPED forward's
    raw model output (the loss is always scored on the canonical view) and
    ``coords_norm`` the (possibly flip-averaged) decoded coordinates.
    """
    out = model.module.apply(variables, images, train=False)
    coords_norm = model.decode(out)
    if cfg.train.flip_eval:
        # Mirrored second pass (reference evaluate.py option): flip the
        # image about x, decode, unflip coords (x -> -x is exact under the
        # symmetric pixel-center grid), swap L/R joints, average.
        from ..data.transforms import flip_permutation

        flipped = jnp.flip(images, axis=2)
        out_f = model.module.apply(variables, flipped, train=False)
        coords_f = model.decode(out_f)
        perm = flip_permutation(coords_f.shape[-2])
        coords_f = coords_f.at[..., 0].multiply(-1.0)[..., perm, :]
        coords_norm = 0.5 * (coords_norm + coords_f)
    return out, coords_norm


def _to_original_px(coords_norm, crop_from_orig, in_size: int):
    """Map normalized crop-space coords back to ORIGINAL-image pixels."""
    from ..data.transforms import invert as _affine_invert

    crop_px = normalized_to_crop_px(coords_norm, in_size)
    return transform_coords(_affine_invert(crop_from_orig), crop_px)


def _build_eval_body(model: PoseModel, cfg: Config):
    """(preprocess_fn, eval_step body) — optimizer-free."""
    in_size = model.image_specs.size
    data_cfg = cfg.data

    def _preprocess(key, batch, train: bool, eval_scale: float = 1.0):
        return preprocess_batch(
            key, batch["canvases"], batch["coords_px"], batch["mask"],
            batch["head_length"], batch["canvas_from_orig"], data_cfg,
            in_size, train, canvas_margin=batch.get("canvas_margin"),
            eval_scale=eval_scale)

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        # Canonical pass (scale 1.0): the eval loss and the ground-truth
        # mapping are always scored here, whatever eval_scales says.
        pre = _preprocess(jax.random.PRNGKey(0), batch, False)
        out, coords_norm = _decode_averaged(model, cfg, variables,
                                            pre["images"])
        loss, _ = model.loss(out, pre["coords"], pre["mask"])
        pred_canonical = _to_original_px(coords_norm, pre["crop_from_orig"],
                                         in_size)

        # Multi-scale averaging (SURVEY C16): each extra scale re-crops,
        # re-decodes, and maps back to ORIGINAL-image pixels through its own
        # inverse affine; predictions average in that shared frame.
        preds = []
        for s in _eval_scales(cfg):
            if s == 1.0:
                preds.append(pred_canonical)
                continue
            pre_s = _preprocess(jax.random.PRNGKey(0), batch, False,
                                eval_scale=s)
            _, coords_s = _decode_averaged(model, cfg, variables,
                                           pre_s["images"])
            preds.append(_to_original_px(coords_s, pre_s["crop_from_orig"],
                                         in_size))
        pred_orig = sum(preds) / len(preds)

        gt_orig = _to_original_px(pre["coords"], pre["crop_from_orig"],
                                  in_size)
        correct, total = pckh_batch_counts(
            pred_orig, gt_orig, pre["mask"], pre["head_length"])
        return {"loss": loss, "pckh_correct": correct, "pckh_total": total,
                "pred_orig": pred_orig}

    return _preprocess, eval_step


def _build_step_bodies(model: PoseModel, cfg: Config, steps_per_epoch: int = 1):
    """Raw (un-jitted) step bodies; composed by make_step_fns/make_multi_step."""
    tx = make_optimizer(cfg.optim, steps_per_epoch, cfg.train.epochs)
    _preprocess, eval_step = _build_eval_body(model, cfg)

    def train_step(state: TrainState, batch):
        aug_key = jax.random.fold_in(state.rng, state.step)
        pre = _preprocess(aug_key, batch, True)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.module.apply(
                variables, pre["images"], train=True, mutable=["batch_stats"])
            loss, aux = model.loss(out, pre["coords"], pre["mask"])
            return loss, (aux, mutated.get("batch_stats", {}))

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        for k in ("euclidean", "reg", "mse"):
            if k in aux:
                metrics[k] = aux[k]
        return new_state, metrics

    return train_step, eval_step


def _make_resident_gather(mesh):
    """Shard-local batch gather from HBM-resident arrays (see data.resident).

    Under ``shard_map`` each device sees its own (rows_per_shard, ...) block
    of every resident array and a (shard_batch,) vector of LOCAL row offsets;
    the gather stays device-local (no collectives) and its output is exactly
    a ``batch_sharding``-sharded global batch.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    spec = P(DATA_AXIS)

    def gather(resident, idx):
        return jax.tree_util.tree_map(lambda a: a[idx], resident)

    return jax.shard_map(gather, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec)


def make_resident_step(model: PoseModel, cfg: Config, mesh,
                       steps_per_epoch: int = 1):
    """Train step over an HBM-resident dataset: (state, resident, idx).

    Identical numerics to the streaming ``train_step`` on the same rows; the
    only difference is where the batch comes from — an on-device gather
    instead of an H2D transfer.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    train_step, _ = _build_step_bodies(model, cfg, steps_per_epoch)
    gather = _make_resident_gather(mesh)

    def step(state: TrainState, resident, idx):
        return train_step(state, gather(resident, idx))

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(ssh, dsh, dsh),
                   out_shardings=(ssh, repl),
                   donate_argnums=(0,) if cfg.train.donate else ())


def make_resident_multi_step(model: PoseModel, cfg: Config, mesh,
                             steps_per_epoch: int = 1):
    """k-step scan over resident data: one dispatch, zero batch H2D.

    With the dataset already in HBM the ``steps_per_dispatch`` scan costs a
    (k, B) int32 index upload (~hundreds of bytes) per dispatch — the
    transfer penalty that made streaming super-batches counterproductive on
    slow transports disappears entirely.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    train_step, _ = _build_step_bodies(model, cfg, steps_per_epoch)
    gather = _make_resident_gather(mesh)

    def multi(state: TrainState, resident, idx_k):
        def body(carry, idx):
            return train_step(carry, gather(resident, idx))

        return jax.lax.scan(body, state, idx_k)

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    ksh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(multi, in_shardings=(ssh, dsh, ksh),
                   out_shardings=(ssh, repl),
                   donate_argnums=(0,) if cfg.train.donate else ())


def make_resident_eval_step(model: PoseModel, cfg: Config, mesh):
    """Eval step over an HBM-resident val split: (state, resident, idx, valid).

    Identical numerics to the streaming ``eval_step`` on the same rows; the
    (B,) ``valid`` vector (see ``data.resident.ResidentEvalData``) is
    multiplied into the joint mask so shard/batch pad rows contribute to
    neither the masked loss denominator nor the PCKh counts.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    _, eval_step = _build_eval_body(model, cfg)
    gather = _make_resident_gather(mesh)

    def step(state: TrainState, resident, idx, valid):
        batch = dict(gather(resident, idx))
        batch["mask"] = batch["mask"] * valid[:, None]
        return eval_step(state, batch)

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(ssh, dsh, dsh, dsh),
                   out_shardings=repl)


def make_resident_eval_scan(model: PoseModel, cfg: Config, mesh):
    """The WHOLE resident eval pass as ONE jitted ``lax.scan`` dispatch.

    ``(state, resident, idxs, valids)`` with ``idxs``/``valids`` of shape
    ``(steps, batch)`` (``ResidentEvalData.epoch_stacked``).  Numerics are
    identical to ``steps`` sequential ``make_resident_eval_step`` calls —
    per-step outputs come back stacked along a leading axis and the host
    reduces them exactly as the streaming drain does — but the host issues
    ONE dispatch per epoch instead of ``steps``.  Over this image's tunneled
    transport each dispatch ISSUE costs ~1 s, which made the per-epoch eval
    pass (~38 dispatches on the 5k rehearsal fixture) the dominant epoch-
    boundary cost of a sustained run (flagship report round 4: ~52 s wall
    per epoch against ~10.5 s of train compute).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    _, eval_step = _build_eval_body(model, cfg)
    gather = _make_resident_gather(mesh)

    def scan_eval(state: TrainState, resident, idxs, valids):
        def body(carry, step_inputs):
            idx, valid = step_inputs
            batch = dict(gather(resident, idx))
            batch["mask"] = batch["mask"] * valid[:, None]
            return carry, eval_step(state, batch)

        _, stacked = jax.lax.scan(body, 0, (idxs, valids))
        return stacked

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    ssh2 = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(scan_eval, in_shardings=(ssh, dsh, ssh2, ssh2),
                   out_shardings=repl)


def make_multi_step(model: PoseModel, cfg: Config, mesh,
                    steps_per_epoch: int = 1):
    """A k-step train function: ``lax.scan`` over a stacked super-batch.

    One host dispatch drives k optimizer steps entirely on device — the
    TPU-native way to amortize per-call dispatch latency (significant over
    remote/tunnel transports and at small step times).  The super-batch dict
    carries a leading ``k`` axis on every array; metrics come back stacked
    ``(k,)``.  Numerics are identical to k sequential ``train_step`` calls.
    """
    train_step, _ = _build_step_bodies(model, cfg, steps_per_epoch)

    def multi_step(state, super_batch):
        def body(carry, batch):
            new_state, metrics = train_step(carry, batch)
            return new_state, metrics

        return jax.lax.scan(body, state, super_batch)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    repl = replicated(mesh)
    ssh = state_sharding_for(model, cfg, mesh)
    # Super-batch: axis 0 = step, axis 1 = (sharded) batch.
    sbsh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(multi_step, in_shardings=(ssh, sbsh),
                   out_shardings=(ssh, repl),
                   donate_argnums=(0,) if cfg.train.donate else ())


def _prefetch_dispatch_groups(batch_iter, k: int, mesh, depth: int = 1):
    """Group host batches into k-step super-batches, staged on device EARLY.

    Yields ``("multi", device_super_batch)`` for full groups and
    ``("single", device_batch)`` per ragged-tail batch.  Stacking + the async
    ``device_put`` happen ``depth`` groups ahead of the consumer, so the
    (k * batch)-sized H2D transfer overlaps the previous dispatch's compute
    instead of sitting inside it (round-2 VERDICT: the k>1 path bypassed
    ``prefetch_to_device`` and paid its transfer synchronously).
    """
    import itertools

    from collections import deque

    from ..parallel.mesh import shard_super_batch

    def staged():
        it = iter(batch_iter)
        while True:
            group = list(itertools.islice(it, k))
            if not group:
                return
            if len(group) < k:
                for b in group:
                    yield "single", shard_batch(mesh, b)
                return
            sb = {key: np.stack([b[key] for b in group]) for key in group[0]}
            yield "multi", shard_super_batch(mesh, sb)

    queue_: deque = deque()
    for item in staged():
        queue_.append(item)
        if len(queue_) > depth:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


@dataclass
class Trainer:
    """Epoch-loop driver: train, periodic eval, checkpointing, metrics."""

    model: PoseModel
    cfg: Config
    mesh: Any
    train_loader: Any
    val_loader: Any = None
    checkpointer: Any = None          # train.checkpoint.CheckpointManager
    metric_writer: Any = None         # train.metrics.MetricWriter
    hooks: tuple = ()

    def __post_init__(self):
        self._autopack = self._maybe_autopack()
        self.resident = self._maybe_resident()
        spe = max((self.resident or self.train_loader).steps_per_epoch, 1)
        self.train_step, self.eval_step = make_step_fns(
            self.model, self.cfg, self.mesh, spe)
        self.multi_step = None
        self.resident_step = self.resident_multi = None
        if self.resident is not None:
            self.resident_step = make_resident_step(
                self.model, self.cfg, self.mesh, spe)
            if self.cfg.train.steps_per_dispatch > 1:
                self.resident_multi = make_resident_multi_step(
                    self.model, self.cfg, self.mesh, spe)
        elif self.cfg.train.steps_per_dispatch > 1:
            # Grouped dispatch is RESIDENT-ONLY.  On the streaming path the
            # k-step super-batch defeats the single-batch H2D/compute overlap
            # and is measured strictly SLOWER than k=1 (docs/
            # bench_streaming.json: 37.5 vs 45.7 img/s @384, 98 vs 185.6
            # @256), so a preset's steps_per_dispatch must not leak into a
            # streaming epoch (e.g. auto-pack epoch 0 on a raw layout).
            # ``_swap_to_packed``/residency re-enable k the moment the input
            # becomes resident.
            self._log0(
                f"steps_per_dispatch={self.cfg.train.steps_per_dispatch} "
                "clamped to 1 on the streaming input path (measured slower "
                "than single-step dispatch, docs/bench_streaming.json); "
                "grouped dispatch re-enables when the input is HBM-resident")
        self.val_resident = self._maybe_val_resident()
        self.resident_eval_scan = None
        if self.val_resident is not None:
            self.resident_eval_scan = make_resident_eval_scan(
                self.model, self.cfg, self.mesh)

    def _log0(self, msg: str):
        if jax.process_index() == 0:
            print(msg, flush=True)

    def _maybe_autopack(self):
        """Install pack-as-you-stream on a decode-backed train split.

        Epoch 0 then doubles as the pack pass (see data.pack.AutoPackDataset);
        the epoch boundary publishes the archive and ``_swap_to_packed``
        hot-swaps the loader (and residency).  Single-host only: the archive
        files would collide across hosts, and a host only streams its 1/N
        slice anyway.
        """
        if not getattr(self.cfg.data, "auto_pack", True):
            return None
        if jax.process_count() != 1:
            return None
        ds = self.train_loader.dataset
        # Duck-typed: only a decode-backed MPII split (images_dir +
        # canvas_size) needs packing; packed/array-backed sources don't.
        if not (hasattr(ds, "images_dir") and hasattr(ds, "canvas_size")):
            return None
        import os

        from ..data.pack import AutoPackDataset

        out_dir = os.path.join(getattr(self.cfg.data, "data_dir", "."),
                               "packed")
        ap = AutoPackDataset(ds, out_dir,
                             subset=getattr(ds, "subset", "train"))
        self.train_loader.dataset = ap
        self._log0(f"auto_pack: epoch 0 streams {len(ds)} samples AND writes "
                   f"the packed archive -> {out_dir} (switching to the mmap "
                   "reader at the epoch boundary; --no-auto-pack disables)")
        return ap

    def _swap_to_packed(self, epoch: int):
        """Publish the auto-packed archive and hot-swap the train input path.

        Residency is re-evaluated exactly as at construction, so with
        ``device_resident`` auto/on the swap goes straight to the HBM-staged
        gather path (one extra jit at the next dispatch).  steps_per_epoch is
        unchanged (same samples, same batch), so the LR schedule and the
        mid-epoch checkpoint cadence are unaffected.
        """
        from ..data.loader import ShardedLoader
        from ..data.pack import PackedDataset

        packed_dir = self._autopack.finalize()
        self._autopack = None
        old = self.train_loader
        ds = PackedDataset(packed_dir, "train")
        self.train_loader = ShardedLoader(
            ds, old.global_batch_size, shuffle=old.shuffle, seed=old.seed,
            num_hosts=old.num_hosts, host_id=old.host_id,
            drop_last=old.drop_last, prefetch=old.prefetch,
            workers=old.workers)
        self._log0(f"auto_pack: published {packed_dir} after epoch {epoch}; "
                   "train input is now the mmap-packed reader")
        self.resident = self._maybe_resident()
        if self.resident is not None:
            spe = max(self.resident.steps_per_epoch, 1)
            self.resident_step = make_resident_step(
                self.model, self.cfg, self.mesh, spe)
            if self.cfg.train.steps_per_dispatch > 1:
                self.resident_multi = make_resident_multi_step(
                    self.model, self.cfg, self.mesh, spe)

    def _maybe_resident(self):
        """Stage the train split in HBM when configured (and it fits)."""
        mode = getattr(self.cfg.data, "device_resident", "off")
        if mode == "off":
            return None
        from ..data.resident import (ResidentTrainData, resident_arrays,
                                     resident_budget_bytes, resident_fits,
                                     resident_nbytes)

        ds = self.train_loader.dataset
        if resident_arrays(ds) is None:
            if mode == "on":
                raise ValueError(
                    "device_resident=on but the train dataset is not "
                    "array-backed; pack it first (data.pack)")
            self._log0("device_resident=auto: train dataset is not "
                       "array-backed -> streaming")
            return None
        d = max(self.mesh.shape.get("data", 1), 1)
        share, budget = resident_nbytes(ds) // d, resident_budget_bytes(
            self.mesh)
        if mode == "auto" and not resident_fits(ds, self.mesh):
            self._log0(
                f"device_resident=auto: train split {share / 2**30:.2f} "
                f"GiB/device > budget {budget / 2**30:.2f} GiB -> streaming "
                "(raise DSNT_RESIDENT_BUDGET_BYTES to force)")
            return None
        self._log0(
            f"device_resident={mode}: staging train split in HBM "
            f"({share / 2**30:.2f} GiB/device, budget {budget / 2**30:.2f} "
            "GiB)")
        return ResidentTrainData(ds, self.cfg.train.batch_size, self.mesh,
                                 seed=self.cfg.train.seed)

    def _maybe_val_resident(self):
        """Stage the val split in HBM too, when configured and it fits.

        Gated on the SAME ``device_resident`` knob as the train split; in
        'auto' mode the fit check charges the budget for whatever the train
        split already staged, so the pair never over-commits HBM.  Falls
        back to the streaming eval pass silently (eval correctness is
        identical either way — see ``run_evaluation_resident``).
        """
        mode = getattr(self.cfg.data, "device_resident", "off")
        if mode == "off" or self.val_loader is None:
            return None
        from ..data.resident import (ResidentEvalData, resident_arrays,
                                     resident_fits, resident_nbytes)

        ds = self.val_loader.dataset
        if resident_arrays(ds) is None:
            return None
        staged = self.resident.nbytes if self.resident is not None else 0
        if mode == "auto" and not resident_fits(ds, self.mesh,
                                                extra_nbytes=staged):
            self._log0(
                "device_resident=auto: val split does not fit beside the "
                "staged train split -> streaming eval")
            return None
        d = max(self.mesh.shape.get("data", 1), 1)
        self._log0(
            f"device_resident={mode}: staging val split in HBM "
            f"({resident_nbytes(ds) / d / 2**30:.2f} GiB/device)")
        return ResidentEvalData(ds, self.cfg.train.batch_size, self.mesh)

    def init_state(self) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        state = create_train_state(
            self.model, self.cfg.optim, rng,
            batch_size=max(2, len(self.mesh.devices.flat)),
            steps_per_epoch=max(self.train_loader.steps_per_epoch, 1),
            epochs=self.cfg.train.epochs)
        pretrained = getattr(self.cfg.data, "pretrained_resnet", "")
        if pretrained and self.model.cfg.base.startswith("resnet"):
            from ..models.import_torch import load_torchvision_resnet

            if pretrained.endswith(".npz"):
                sd = dict(np.load(pretrained))
            else:
                import torch

                sd = torch.load(pretrained, map_location="cpu",
                                weights_only=True)
            variables = load_torchvision_resnet(
                {"params": state.params, "batch_stats": state.batch_stats}, sd)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        return jax.device_put(
            state, state_sharding_for(self.model, self.cfg, self.mesh))

    def run(self, state: TrainState | None = None, start_epoch: int = 0,
            best_pckh: float = -1.0, start_step: int = 0):
        """``best_pckh`` seeds the best-model tracker; on resume pass the
        previously recorded best so a worse resumed model does not clobber
        the ``ckpt_best`` slot.  ``start_step`` resumes the FIRST epoch at a
        mid-epoch offset (exact: the loader replays the remaining index
        stream and augmentation keys derive from the restored global step).
        """
        cfg = self.cfg
        if state is None:
            state = self.init_state()
        local_bs = self.train_loader.local_batch_size
        k_dispatch = max(cfg.train.steps_per_dispatch, 1)
        every_steps = cfg.train.checkpoint_every_steps
        spe = (self.resident or self.train_loader).steps_per_epoch
        for epoch in range(start_epoch, cfg.train.epochs):
            t0 = time.time()
            losses = []
            step_in_epoch = start_step if epoch == start_epoch else 0

            def maybe_save_step(s, sie):
                # Only strictly inside the epoch: the boundary save follows.
                if (self.checkpointer and every_steps and sie < spe
                        and sie % every_steps == 0):
                    self.checkpointer.save_step(s, epoch=epoch,
                                                step_in_epoch=sie)

            # All four input modes (resident/streaming x single/multi-step)
            # are normalized to one ("single"|"multi", payload) group stream
            # plus a pair of step functions, so loss bookkeeping, step
            # counting, checkpoint cadence and metric logging live in ONE
            # loop.  Logging semantics per mode: single-step dispatch logs
            # the full metrics dict every ``log_every_steps``; multi-step
            # dispatch only has the scanned losses, logged once per dispatch
            # (its ragged single tail does not log).
            if self.resident is not None:
                res = self.resident.resident
                single_fn = lambda st, idx: self.resident_step(st, res, idx)
                if self.resident_multi is not None:
                    multi_fn = lambda st, idx: self.resident_multi(
                        st, res, idx)
                    groups = self.resident.epoch_groups(
                        epoch, k_dispatch, step_in_epoch)
                else:
                    multi_fn = None
                    groups = (("single", idx) for idx in
                              self.resident.epoch(epoch, step_in_epoch))
            else:
                single_fn = self.train_step
                multi_fn = self.multi_step
                if multi_fn is not None:
                    groups = _prefetch_dispatch_groups(
                        self.train_loader.epoch(epoch, step_in_epoch),
                        k_dispatch, self.mesh)
                else:
                    groups = (("single", b) for b in prefetch_to_device(
                        self.train_loader.epoch(epoch, step_in_epoch),
                        self.mesh))

            # Metric-log fetches LAG dispatch by a bounded window: a
            # device_get on the just-dispatched state is a full dispatch
            # barrier, which on a tunneled/slow transport serializes every
            # dispatch (measured: per-dispatch loss fetches alone held the
            # resident hg8 path to ~40% of its bench throughput).  The
            # global step is tracked on host for the same reason.
            from collections import deque

            dispatches = 0  # log gate counter
            steps_done = 0
            base_step = int(jax.device_get(state.step))
            pending: deque = deque()

            def enqueue_log(rec, vals):
                # Start the D2H copy NOW: by the time the lag window drains
                # this record (>= _MAX_INFLIGHT dispatches later) the bytes
                # are already host-side and device_get is local — otherwise
                # every drain pays a full tunnel round-trip (~57/epoch held
                # the flagship resident run to 81% of its bare-loop bench).
                for v in vals.values():
                    if hasattr(v, "copy_to_host_async"):
                        v.copy_to_host_async()
                pending.append((rec, vals))
                drain_logs(_MAX_INFLIGHT)

            def drain_logs(limit: int = 0):
                while len(pending) > limit:
                    rec, vals = pending.popleft()
                    got = jax.device_get(vals)
                    self.metric_writer.write(
                        {**rec, **{k: float(v) for k, v in got.items()}})

            log_every_dispatches = max(
                1, cfg.train.log_every_steps // k_dispatch)
            for kind, payload in groups:
                if kind == "single":
                    state, m = single_fn(state, payload)
                    losses.append(m["loss"])
                    steps_done += 1
                    step_in_epoch += 1
                    maybe_save_step(state, step_in_epoch)
                    if (self.metric_writer and multi_fn is None and
                            dispatches % cfg.train.log_every_steps == 0):
                        enqueue_log(
                            {"epoch": epoch, "step": base_step + steps_done},
                            dict(m))
                else:
                    state, ms = multi_fn(state, payload)
                    losses.append(ms["loss"])  # (k,) device array
                    steps_done += k_dispatch
                    step_in_epoch += k_dispatch
                    maybe_save_step(state, step_in_epoch)
                    if (self.metric_writer and
                            dispatches % log_every_dispatches == 0):
                        enqueue_log(
                            {"epoch": epoch, "step": base_step + steps_done},
                            {"loss": ms["loss"][-1]})
                dispatches += 1
            if self.metric_writer:
                drain_logs(0)
            jax.block_until_ready(state.params)
            epoch_time = time.time() - t0
            # Overlap the per-dispatch loss fetches: a serial device_get of
            # ~300 tiny (k,) arrays pays one tunnel round-trip EACH (~1s per
            # epoch measured on the flagship resident run — the bulk of its
            # gap to the bare-loop bench); async-copy them all first so the
            # drain is a single transfer wave.
            for x in losses:
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
            flat_losses = (np.concatenate(
                [np.atleast_1d(np.asarray(x)) for x in jax.device_get(losses)])
                if losses else np.zeros(0))
            n_steps = int(flat_losses.size)
            train_loss = float(flat_losses.mean()) if n_steps else float("nan")

            summary = {"epoch": epoch, "train_loss": train_loss,
                       "epoch_seconds": epoch_time,
                       "images_per_sec": n_steps * local_bs * jax.process_count() / max(epoch_time, 1e-9)}
            will_ckpt = bool(self.checkpointer) and \
                (epoch + 1) % cfg.train.checkpoint_every_epochs == 0
            if will_ckpt:
                # Start the checkpoint's state D2H NOW, before the eval
                # dispatch: the copies ride the transport while the eval
                # scan owns the device, so the boundary pays
                # max(eval, state-fetch) instead of their sum (round-4
                # flagship: the boundary was ~5x the epoch's train compute).
                for leaf in jax.tree_util.tree_leaves(state):
                    if hasattr(leaf, "copy_to_host_async"):
                        leaf.copy_to_host_async()
            if self.val_loader is not None and \
                    (epoch + 1) % cfg.train.eval_every_epochs == 0:
                sample_dir = None
                if self.metric_writer is not None and self.metric_writer.path:
                    import os

                    sample_dir = os.path.join(
                        os.path.dirname(self.metric_writer.path), "samples")
                tb = time.time()
                val = self.evaluate(state, sample_dir=sample_dir, epoch=epoch)
                summary.update({"val_loss": val["loss"],
                                "val_pckh": val["pckh"],
                                "eval_seconds": round(time.time() - tb, 3)})
                is_best = val["pckh"] > best_pckh
                best_pckh = max(best_pckh, val["pckh"])
            else:
                is_best = False
            if will_ckpt:
                # Hand orbax a HOST snapshot (the async copies above have
                # already landed or overlap the eval): the save()'s
                # serialization phase then does no device fetches and its
                # write thread runs past the epoch boundary.
                tb = time.time()
                host_state = jax.device_get(state)
                self.checkpointer.save(epoch, host_state, is_best=is_best,
                                       metrics=summary)
                summary["ckpt_seconds"] = round(time.time() - tb, 3)
            if self.metric_writer:
                self.metric_writer.write(summary)
            for hook in self.hooks:
                hook(epoch, state, summary)
            if self._autopack is not None:
                # finalize() fills any rows this epoch never fetched
                # (drop_last tail, or a mid-epoch resume), so one streamed
                # epoch — complete or not — is always enough to publish.
                self._swap_to_packed(epoch)
        if self.checkpointer:
            self.checkpointer.wait()
        return state, best_pckh

    def evaluate(self, state: TrainState, sample_dir: str | None = None,
                 epoch: int = 0) -> dict:
        if self.val_resident is not None:
            return run_evaluation_resident_scan(
                self.resident_eval_scan, state, self.val_resident,
                self.model.cfg.num_joints, sample_dir=sample_dir,
                epoch=epoch, dataset=self.val_loader.dataset)
        return run_evaluation(self.eval_step, state, self.mesh,
                              self.val_loader, self.model.cfg.num_joints,
                              sample_dir=sample_dir, epoch=epoch)


def run_evaluation(eval_step, state, mesh, loader, num_joints: int,
                   sample_dir: str | None = None, epoch: int = 0) -> dict:
    """Drive one full pass of ``loader`` through a jitted eval step.

    Batches are prefetched to device (H2D overlaps the previous step's
    compute) and metric fetches lag dispatch by a bounded window, so the
    eval pass pipelines instead of serializing transfer -> compute -> fetch
    while never queuing more than ``_MAX_INFLIGHT`` executions (each queued
    execution pins its input batch in device HBM).
    """
    from collections import deque

    from ..data.loader import prefetch_pairs

    evaluator = PCKhEvaluator(num_joints)
    losses = []
    first = None
    inflight: deque = deque()

    def drain(out):
        evaluator.add_counts(jax.device_get(out["pckh_correct"]),
                             jax.device_get(out["pckh_total"]))
        losses.append(float(jax.device_get(out["loss"])))

    for host_batch, dev_batch in prefetch_pairs(loader.epoch(0), mesh):
        out = eval_step(state, dev_batch)
        inflight.append(out)
        if first is None:
            first = (host_batch, out)
        if len(inflight) > _MAX_INFLIGHT:
            drain(inflight.popleft())
    while inflight:
        drain(inflight.popleft())
    if first is not None:
        first = (first[0], np.asarray(jax.device_get(first[1]["pred_orig"])))
    if sample_dir and first is not None and jax.process_index() == 0:
        _dump_samples(sample_dir, epoch, first[0], first[1])
    return {"loss": float(np.mean(losses)) if losses else float("nan"),
            "pckh": evaluator.total_pckh(),
            "evaluator": evaluator}


def run_evaluation_resident(resident_eval_step, state, res, num_joints: int,
                            sample_dir: str | None = None, epoch: int = 0,
                            dataset=None) -> dict:
    """One full eval pass over an HBM-resident val split.

    The per-step H2D is a (B,) int32 + (B,) float32 upload (~hundreds of
    bytes) instead of a multi-MB canvas batch, so in-training eval stops
    paying the val-split transfer every epoch.  Dispatches run ahead of
    metric fetches by the same bounded window as the streaming pass.
    """
    from collections import deque

    evaluator = PCKhEvaluator(num_joints)
    losses = []
    first_out = None
    inflight: deque = deque()

    def drain(out):
        evaluator.add_counts(jax.device_get(out["pckh_correct"]),
                             jax.device_get(out["pckh_total"]))
        losses.append(float(jax.device_get(out["loss"])))

    for idx, valid in res.epoch():
        out = resident_eval_step(state, res.resident, idx, valid)
        inflight.append(out)
        if first_out is None:
            first_out = out
        if len(inflight) > _MAX_INFLIGHT:
            drain(inflight.popleft())
    while inflight:
        drain(inflight.popleft())
    if (sample_dir and first_out is not None and dataset is not None
            and jax.process_index() == 0):
        # Reconstruct the first step's host rows for skeleton renders (the
        # resident pass never materializes a host batch).
        from ..data.resident import resident_arrays

        arrays = resident_arrays(dataset)
        rows = res.host_rows(0)[:4]
        host_batch = {k: np.asarray(a[rows]) for k, a in arrays.items()}
        preds = np.asarray(jax.device_get(first_out["pred_orig"]))
        _dump_samples(sample_dir, epoch, host_batch, preds)
    return {"loss": float(np.mean(losses)) if losses else float("nan"),
            "pckh": evaluator.total_pckh(),
            "evaluator": evaluator}


def run_evaluation_resident_scan(resident_eval_scan, state, res,
                                 num_joints: int,
                                 sample_dir: str | None = None,
                                 epoch: int = 0, dataset=None) -> dict:
    """One full eval pass as a single scan dispatch + a single fetch.

    Same results as :func:`run_evaluation_resident` (the stacked per-step
    outputs are reduced in the identical order); the host round-trip count
    per epoch drops from ``steps_per_epoch`` dispatches + fetches to 1 + 1.
    """
    idxs, valids = res.epoch_stacked()
    stacked = resident_eval_scan(state, res.resident, idxs, valids)
    for v in stacked.values():
        if hasattr(v, "copy_to_host_async"):
            v.copy_to_host_async()
    host = jax.device_get(stacked)
    evaluator = PCKhEvaluator(num_joints)
    correct, total = np.asarray(host["pckh_correct"]), \
        np.asarray(host["pckh_total"])
    for s in range(correct.shape[0]):
        evaluator.add_counts(correct[s], total[s])
    losses = np.asarray(host["loss"])
    if (sample_dir and dataset is not None and jax.process_index() == 0):
        from ..data.resident import resident_arrays

        arrays = resident_arrays(dataset)
        rows = res.host_rows(0)[:4]
        host_batch = {k: np.asarray(a[rows]) for k, a in arrays.items()}
        preds = np.asarray(host["pred_orig"][0])
        _dump_samples(sample_dir, epoch, host_batch, preds)
    return {"loss": float(losses.mean()) if losses.size else float("nan"),
            "pckh": evaluator.total_pckh(),
            "evaluator": evaluator}


@dataclass
class EvalDriver:
    """Evaluate/infer execution path: compiles ONLY the eval graph.

    The reference's evaluate.py/infer.py load a checkpoint and run forward
    passes (SURVEY.md C16/C17); this driver is their counterpart without any
    Trainer machinery — no optimizer transforms beyond the restore template,
    no train-step jit, no multi-step scan.
    """

    model: PoseModel
    cfg: Config
    mesh: Any
    loader: Any

    def __post_init__(self):
        self.eval_step = make_eval_fn(self.model, self.cfg, self.mesh)
        self._infer_step = None  # built on first predict() (serving graph)

    def init_state(self) -> TrainState:
        """Restore template matching the Trainer's TrainState structure."""
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        state = create_train_state(
            self.model, self.cfg.optim, rng,
            batch_size=max(2, len(self.mesh.devices.flat)),
            epochs=self.cfg.train.epochs)
        return jax.device_put(
            state, state_sharding_for(self.model, self.cfg, self.mesh))

    def evaluate(self, state: TrainState, sample_dir: str | None = None,
                 epoch: int = 0) -> dict:
        return run_evaluation(self.eval_step, state, self.mesh, self.loader,
                              self.model.cfg.num_joints,
                              sample_dir=sample_dir, epoch=epoch)

    def predict(self, state: TrainState) -> np.ndarray:
        """Original-image-space predictions over the loader, in DATASET order.

        Global batches interleave host shards (host h holds every
        ``num_hosts``-th sample), so rows are scattered back through the
        loader's per-batch dataset-index map instead of concatenated; pad
        rows (index -1) are dropped by index, not by tail truncation.  The
        result covers every dataset row under any ``num_hosts``.
        """
        from ..data.loader import prefetch_pairs
        from ..parallel.mesh import check_row_order

        check_row_order(self.mesh)
        if self._infer_step is None:
            # Serving graph: forward+decode+untransform only — an hg8
            # predict run never compiles the loss/PCKh eval graph.
            self._infer_step = make_infer_fn(self.model, self.cfg, self.mesh)
        n = len(self.loader.dataset)
        out_arr = np.zeros((n, self.model.cfg.num_joints, 2), np.float32)
        # Coverage is tracked with an explicit boolean, NOT a NaN sentinel:
        # a diverged model legitimately emits NaN coords, which must be
        # written out, not mistaken for an uncovered row.
        covered = np.zeros((n,), bool)
        gidx = self.loader.global_index_batches(0)

        def scatter(gi, out):
            preds = np.asarray(jax.device_get(out))
            keep = gi >= 0
            out_arr[gi[keep]] = preds[keep]
            covered[gi[keep]] = True

        # Fetches lag dispatch by a bounded window so the pass pipelines
        # without queuing an unbounded number of executions (each queued
        # execution pins its input batch in device HBM).
        from collections import deque
        inflight: deque = deque()
        count = 0
        for _, dev_batch in prefetch_pairs(self.loader.epoch(0), self.mesh):
            if count < len(gidx):
                inflight.append((gidx[count], self._infer_step(state,
                                                               dev_batch)))
            count += 1
            if len(inflight) > _MAX_INFLIGHT:
                scatter(*inflight.popleft())
        if count != len(gidx):
            raise RuntimeError(
                f"loader produced {count} batches, index map has "
                f"{len(gidx)}")
        while inflight:
            scatter(*inflight.popleft())
        if not covered.all():
            raise RuntimeError(
                f"predict() left {int((~covered).sum())} of {n} dataset "
                "rows uncovered (loader/index-map mismatch)")
        return out_arr
