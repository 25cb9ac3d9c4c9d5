"""Training engine: per-mouse jitted gradient steps, gradient accumulation
across the mouse cycle, validation, inference and challenge evaluation.

Faithful to the reference schedule (reference train.py:42-190):
- ``CycleLoaders`` round-robin over mice; gradients ACCUMULATE (sum) across
  one batch per mouse; one optimizer update per full cycle
  (update_frequency = num_mice, train.py:97-111),
- loss = criterion + (micro/batch)-scaled regularizer per micro-batch
  (train.py:65-72),
- validation stacks targets/predictions per mouse then computes
  msse/poisson/single-trial-corr (train.py:28-39, 158-190),
- ``evaluate`` computes the challenge metrics per mouse and overall averages,
  writing evaluation.yaml (reference utils/utils.py:103-199).

TPU-first specifics:
- every batch is padded to a static shape and carries a 0/1 sample mask so
  each mouse compiles exactly one train and one eval executable,
- bf16 compute / fp32 params replaces fp16 AMP + GradScaler,
- steps run under jit with donated params/opt_state; batches can be sharded
  over a data-parallel mesh (v1t_tpu/parallel) in which case XLA inserts the
  gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import contextlib
import os
import typing as t
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import yaml as pyyaml

from v1t_tpu import losses, optim
from v1t_tpu.configs import Config
from v1t_tpu.data.cards import DataCard
from v1t_tpu.data.loaders import BatchLoader, CycleLoaders
from v1t_tpu.metrics import Metrics
from v1t_tpu.models import model_regularizer
from v1t_tpu.models.model import Model


class PreparedBatch(t.NamedTuple):
    """One training batch staged on device: [(arrays, mask, n_real), ...]
    micro-batches plus the true (unpadded) batch size."""

    micros: list
    total: int


def pad_batch(batch: t.Dict[str, np.ndarray], batch_size: int):
    """Pad every array in the batch to ``batch_size`` rows and return the
    0/1 sample mask. Keeps shapes static so each mouse compiles once."""
    n = len(batch["image"])
    mask = np.zeros(batch_size, np.float32)
    mask[:n] = 1.0
    if n == batch_size:
        return batch, mask
    padded = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n:
            pad_width = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
            padded[k] = np.pad(v, pad_width)
        else:
            padded[k] = v
    return padded, mask


class Trainer:
    """Owns (params, opt_state) and the jitted per-mouse step functions."""

    def __init__(
        self,
        config: Config,
        model: Model,
        params: dict,
        data_card: DataCard,
        core_frozen: bool = False,
        mesh=None,
        model_state: t.Optional[dict] = None,
        regularizer_fn=None,
        trainable_modules: t.Optional[t.List[str]] = None,
        weight_decay: float = 0.0,
    ):
        self.config = config
        self.model = model
        self.data_card = data_card
        self.core_frozen = core_frozen
        # non-parameter collections (BatchNorm batch_stats for the
        # stacked2d/stn cores); empty for the flagship vit
        self.model_state = model_state or {}
        # regularizer override (the ensemble model has none,
        # reference ensemble.py:128-129)
        self.regularizer_fn = regularizer_fn
        self.criterion = losses.get_criterion(config, data_card.ds_sizes)
        self.tx, self.opt_state = optim.build_optimizer(
            config, params, core_frozen=core_frozen,
            trainable_modules=trainable_modules, weight_decay=weight_decay,
        )
        self.params = params
        self.mesh = mesh  # parallel.DataParallel or None
        self.base_rng = jax.random.key(config.seed)
        self._step_count = 0

        self._grad_fns: dict = {}
        self._eval_fns: dict = {}
        self._predict_fns: dict = {}
        self._cycle_fns: dict = {}
        self._accumulate = jax.jit(
            lambda acc, g: jax.tree_util.tree_map(jnp.add, acc, g)
        )
        self._apply = jax.jit(self._apply_update, donate_argnums=(0, 1))

        if self.mesh is not None:
            assert config.effective_micro_batch_size % self.mesh.data_size == 0, (
                f"micro batch size {config.effective_micro_batch_size} must be "
                f"divisible by the data-parallel mesh size "
                f"{self.mesh.data_size}"
            )
            self.params = self.mesh.replicate(self.params)
            self.opt_state = self.mesh.replicate(self.opt_state)
            if self.model_state:
                self.model_state = self.mesh.replicate(self.model_state)

    # --- jitted step builders --------------------------------------------------

    def _apply_update(self, params, opt_state, grads):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return params, opt_state

    def _loss_terms(
        self, params, state, batch, mask, rng, mouse_id: str, train: bool,
        batch_size=None, reg_weight=1.0,
    ):
        """One micro-batch's loss; ``batch_size`` is the FULL batch size used
        for ds scaling and ``reg_weight`` the (micro/batch) regularizer
        fraction (reference train.py:65-72)."""
        rngs = None
        if train:
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "droppath": jax.random.fold_in(rng, 1),
                "sample": jax.random.fold_in(rng, 2),
            }
        mutable = list(state.keys()) if (train and state) else False
        result = self.model.apply(
            {"params": params, **state},
            batch["image"],
            mouse_id=mouse_id,
            behaviors=batch["behavior"],
            pupil_centers=batch["pupil_center"],
            train=train,
            rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            (y_pred, _, _), new_state = result
        else:
            y_pred, _, _ = result
            new_state = state
        loss = self.criterion(
            y_true=batch["response"],
            y_pred=y_pred,
            mouse_id=mouse_id,
            batch_size=jnp.sum(mask) if batch_size is None else batch_size,
            mask=mask,
        )
        if self.regularizer_fn is not None:
            reg = self.regularizer_fn(params, mouse_id)
        else:
            reg = model_regularizer(
                self.config, params, mouse_id=mouse_id,
                core_frozen=self.core_frozen,
            )
        reg_loss = reg_weight * reg
        return loss, reg_loss, y_pred, new_state

    def _get_grad_fn(self, mouse_id: str):
        if mouse_id not in self._grad_fns:

            def step(params, state, batch, mask, rng, batch_size, reg_weight):
                def loss_fn(p):
                    loss, reg_loss, _, new_state = self._loss_terms(
                        p, state, batch, mask, rng, mouse_id, train=True,
                        batch_size=batch_size, reg_weight=reg_weight,
                    )
                    total = loss + reg_loss
                    return total, (loss, reg_loss, new_state)

                (total, (loss, reg_loss, new_state)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                metrics = {
                    "loss/loss": loss,
                    "loss/reg_loss": reg_loss,
                    "loss/total_loss": total,
                }
                return grads, new_state, metrics

            jit_kwargs = {}
            if self.mesh is not None:
                jit_kwargs = self.mesh.step_shardings()
            self._grad_fns[mouse_id] = jax.jit(step, **jit_kwargs)
        return self._grad_fns[mouse_id]

    def _get_cycle_fn(self, mouse_ids: t.Tuple[str, ...]):
        """One jitted program for a FULL mouse cycle: the per-mouse gradient
        steps, the cross-mouse gradient accumulation and the optimizer
        update, with params/opt_state donated. Numerically identical to the
        per-step path (same grad programs, same fp32 accumulation order,
        same fold_in stream — pinned by tests/test_fused_cycle.py); the
        point is DISPATCH: one relay round-trip per cycle instead of ~10
        (6 grad calls + 5 accumulate + apply), which is what separates the
        epoch bench from the step bench on remote-attached TPUs
        (BENCH_NOTES round 4: ~40 ms/step of per-dispatch overhead)."""
        if mouse_ids not in self._cycle_fns:

            def cycle(
                params, opt_state, model_state, batches, masks, rng_counts,
                batch_sizes, reg_weights,
            ):
                state = model_state
                acc = None
                metrics_out = []
                for j, mouse_id in enumerate(mouse_ids):
                    rng = jax.random.fold_in(self.base_rng, rng_counts[j])

                    def loss_fn(p, state=state, j=j, mouse_id=mouse_id,
                                rng=rng):
                        loss, reg_loss, _, new_state = self._loss_terms(
                            p, state, batches[j], masks[j], rng, mouse_id,
                            train=True, batch_size=batch_sizes[j],
                            reg_weight=reg_weights[j],
                        )
                        total = loss + reg_loss
                        return total, (loss, reg_loss, new_state)

                    (total, (loss, reg_loss, state)), grads = (
                        jax.value_and_grad(loss_fn, has_aux=True)(params)
                    )
                    acc = (
                        grads
                        if acc is None
                        else jax.tree_util.tree_map(jnp.add, acc, grads)
                    )
                    metrics_out.append({
                        "loss/loss": loss,
                        "loss/reg_loss": reg_loss,
                        "loss/total_loss": total,
                    })
                params, opt_state = self._apply_update(params, opt_state, acc)
                return params, opt_state, state, metrics_out

            self._cycle_fns[mouse_ids] = jax.jit(
                cycle, donate_argnums=(0, 1, 2)
            )
        return self._cycle_fns[mouse_ids]

    def cycle_fusible(self, items) -> bool:
        """Whether ``items`` — one prepared batch per mouse, in loader
        order — can run through the fused cycle program: single-process,
        no mesh (the meshed step carries its own shardings), and exactly
        one micro-batch per mouse (micro_batching splits otherwise)."""
        if self.mesh is not None or jax.process_count() > 1:
            return False
        if os.environ.get("V1T_FUSED_CYCLE", "1") == "0":
            return False
        return all(len(batch.micros) == 1 for _, batch in items)

    def train_cycle(self, items):
        """Run one full mouse cycle (one ``PreparedBatch`` per mouse) as a
        single fused jitted call ending in the optimizer update. Returns
        the per-mouse metrics dicts (device scalars — materialized once
        per epoch by log_metrics)."""
        mouse_ids = tuple(mouse_id for mouse_id, _ in items)
        arrays, masks, batch_sizes, reg_weights = [], [], [], []
        for _, batch in items:
            (a, m, n), = batch.micros
            arrays.append(a)
            masks.append(m)
            batch_sizes.append(np.float32(batch.total))
            reg_weights.append(np.float32(n / batch.total))
        counts = self._step_count + 1 + np.arange(len(items), dtype=np.int32)
        self._step_count += len(items)
        fn = self._get_cycle_fn(mouse_ids)
        self.params, self.opt_state, self.model_state, metrics = fn(
            self.params, self.opt_state, self.model_state,
            tuple(arrays), tuple(masks), counts,
            np.asarray(batch_sizes), np.asarray(reg_weights),
        )
        return metrics

    def _get_eval_fn(self, mouse_id: str):
        if mouse_id not in self._eval_fns:

            def step(params, state, batch, mask, batch_size, reg_weight):
                loss, reg_loss, y_pred, _ = self._loss_terms(
                    params, state, batch, mask, None, mouse_id, train=False,
                    batch_size=batch_size, reg_weight=reg_weight,
                )
                metrics = {
                    "loss/loss": loss,
                    "loss/reg_loss": reg_loss,
                    "loss/total_loss": loss + reg_loss,
                }
                return metrics, y_pred

            self._eval_fns[mouse_id] = jax.jit(step)
        return self._eval_fns[mouse_id]

    def _get_predict_fn(self, mouse_id: str):
        if mouse_id not in self._predict_fns:

            def step(params, state, batch):
                y_pred, _, _ = self.model.apply(
                    {"params": params, **state},
                    batch["image"],
                    mouse_id=mouse_id,
                    behaviors=batch["behavior"],
                    pupil_centers=batch["pupil_center"],
                    train=False,
                )
                return y_pred

            self._predict_fns[mouse_id] = jax.jit(step)
        return self._predict_fns[mouse_id]

    def _kernel_mesh(self):
        """Ambient data-mesh registration for the Pallas kernel call sites
        (v1t_tpu/parallel/kernel_sharding.py) — wrapped around every jitted
        step CALL because the registry is read at trace time, and scoped so
        a meshed and an unmeshed Trainer can coexist in one process."""
        if self.mesh is not None:
            from v1t_tpu.parallel import kernel_sharding

            return kernel_sharding.activate(self.mesh.mesh, "data")
        return contextlib.nullcontext()

    def _device_batch(self, batch, mask):
        arrays = {
            "image": batch["image"],
            "response": batch["response"],
            "behavior": batch["behavior"],
            "pupil_center": batch["pupil_center"],
        }
        if self.mesh is not None:
            arrays = self.mesh.shard_batch(arrays)
            mask = self.mesh.shard_mask(mask)
        return arrays, mask

    # --- public steps ------------------------------------------------------------

    def prepare_batch(self, batch: t.Dict[str, np.ndarray]) -> "PreparedBatch":
        """Host-side batch preparation + ASYNC device transfer: pad each
        micro-batch to the static shape and issue its device_put. Called
        from the prefetch thread in ``train_epoch`` so the H2D transfer of
        batch i+1 overlaps the compute of batch i (double buffering) —
        through a remote-attached relay the transfer otherwise sits on the
        step's critical path.

        Multi-host (jax.process_count() > 1): every process passes its
        HOST-LOCAL rows (global_batch / num_processes, symmetric across
        hosts); the static shapes, ds-scale totals and regularizer weights
        are all GLOBAL — shard_batch stitches the local rows into
        globally-sharded arrays (parallel/multihost.py)."""
        procs = jax.process_count()
        micro = self.config.effective_micro_batch_size
        if procs > 1:
            assert micro % procs == 0, (
                f"micro batch size {micro} must divide over "
                f"{procs} processes"
            )
            micro //= procs
        true_total = len(batch["image"]) * procs
        from v1t_tpu.data.loaders import micro_batching

        micros = []
        for micro_batch in micro_batching(batch, micro):
            padded, mask = pad_batch(micro_batch, micro)
            arrays, mask_dev = self._device_batch(padded, mask)
            micros.append(
                (arrays, mask_dev, len(micro_batch["image"]) * procs)
            )
        return PreparedBatch(micros=micros, total=true_total)

    def train_step(
        self,
        mouse_id: str,
        batch: t.Union[t.Dict[str, np.ndarray], "PreparedBatch"],
        acc_grads,
        update: bool,
    ):
        """Gradient accumulation step for one mouse's batch (reference
        train_step, train.py:42-81); optimizer update when ``update``.
        Accepts either a raw host batch dict or a ``PreparedBatch`` already
        staged on device by the prefetcher."""
        if not isinstance(batch, PreparedBatch):
            batch = self.prepare_batch(batch)
        metrics_sum = None
        true_total = batch.total
        for arrays, mask, n in batch.micros:
            # ds-scale uses the FULL batch size (reference train.py:65-70);
            # the regularizer is scaled by micro/batch (train.py:71)
            reg_weight = np.float32(n / true_total)
            self._step_count += 1
            rng = jax.random.fold_in(self.base_rng, self._step_count)
            with self._kernel_mesh():
                grads, self.model_state, metrics = self._get_grad_fn(mouse_id)(
                    self.params, self.model_state, arrays, mask, rng,
                    np.float32(true_total), reg_weight,
                )
            acc_grads = (
                grads
                if acc_grads is None
                else self._accumulate(acc_grads, grads)
            )
            metrics_sum = (
                metrics
                if metrics_sum is None
                else {k: metrics_sum[k] + v for k, v in metrics.items()}
            )
        if update:
            self.params, self.opt_state = self._apply(
                self.params, self.opt_state, acc_grads
            )
            acc_grads = None
        # metrics stay ON DEVICE (jax scalars): converting here would block
        # the dispatch queue once per mouse per cycle — the epoch loop
        # materializes them once per epoch in log_metrics
        return acc_grads, metrics_sum

    def validation_step(self, mouse_id: str, batch: t.Dict[str, np.ndarray]):
        micro = self.config.effective_micro_batch_size
        from v1t_tpu.data.loaders import micro_batching

        metrics_sum, targets, predictions = None, [], []
        true_total = len(batch["image"])
        for micro_batch in micro_batching(batch, micro):
            n = len(micro_batch["image"])
            padded, mask = pad_batch(micro_batch, micro)
            arrays, mask_dev = self._device_batch(padded, mask)
            with self._kernel_mesh():
                metrics, y_pred = self._get_eval_fn(mouse_id)(
                    self.params, self.model_state, arrays, mask_dev,
                    np.float32(true_total), np.float32(n / true_total),
                )
            metrics_sum = (
                metrics
                if metrics_sum is None
                else {k: metrics_sum[k] + v for k, v in metrics.items()}
            )
            targets.append(micro_batch["response"])
            predictions.append(np.asarray(y_pred)[:n])
        return (
            {k: float(v) for k, v in metrics_sum.items()},
            np.concatenate(targets),
            np.concatenate(predictions),
        )

    def predict(self, mouse_id: str, batch: t.Dict[str, np.ndarray]) -> np.ndarray:
        micro = self.config.effective_micro_batch_size
        from v1t_tpu.data.loaders import micro_batching

        outs = []
        for micro_batch in micro_batching(batch, micro):
            n = len(micro_batch["image"])
            padded, _ = pad_batch(micro_batch, micro)
            arrays, _ = self._device_batch(padded, np.ones(micro, np.float32))
            with self._kernel_mesh():
                y_pred = self._get_predict_fn(mouse_id)(
                    self.params, self.model_state, arrays
                )
            outs.append(np.asarray(y_pred)[:n])
        return np.concatenate(outs)


def restore_best(scheduler, trainer: Trainer) -> None:
    """Reload the best checkpoint into the trainer before the final test
    evaluation — parameters AND non-parameter state (BatchNorm running
    statistics for the stacked2d/stn cores), matching the reference's full
    state_dict restore (reference scheduler.py:122-136). Restoring params
    alone would evaluate best-epoch weights against last-epoch batch_stats."""
    _, trainer.params, _, trainer.model_state = scheduler.restore(
        trainer.params, model_state=trainer.model_state
    )


def compute_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> dict:
    """Per-epoch validation metrics (reference train.py:28-39)."""
    sq = np.sum(np.square(y_true - y_pred), axis=-1)
    m = float(np.sum(sq))
    eps = 1e-12
    pl = float(np.sum(y_pred - y_true * np.log(y_pred + eps)))
    corr = losses.correlation(y1=y_pred, y2=y_true, dim=0)
    return {
        "metrics/msse": m,
        "metrics/poisson_loss": pl,
        "metrics/single_trial_correlation": float(np.mean(corr)),
    }


def _device_prefetch(trainer: Trainer, iterator, depth: int = 2):
    """Double-buffer host->device transfers: a background thread pads each
    batch and issues its (async) device_put ``depth`` batches ahead of the
    consumer, overlapping H2D with the running step."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    errors: list = []

    def _put(item) -> bool:
        # bounded put that gives up once the consumer is gone — a plain
        # q.put would block this thread forever (pinning device-resident
        # prepared batches) when the generator is abandoned mid-epoch
        # (NaN abort, interrupt, a sweep trial failing)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for mouse_id, batch in iterator:
                if stop.is_set():
                    return
                if not _put((mouse_id, trainer.prepare_batch(batch))):
                    return
        except BaseException as exc:  # surfaced in the consumer
            errors.append(exc)
        finally:
            _put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()
        try:  # release any device batches still staged in the queue
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def train_epoch(
    trainer: Trainer, ds: t.Dict[str, BatchLoader], epoch: int, summary=None
) -> dict:
    """One epoch over CycleLoaders with cross-mouse gradient accumulation
    (reference train, train.py:84-116). Batches are staged on device by a
    prefetch thread (see _device_prefetch)."""
    mouse_ids = list(ds.keys())
    results: dict = {m: {} for m in mouse_ids}
    cyc = CycleLoaders(ds)
    update_frequency = len(mouse_ids)
    acc = None
    i = 0
    cycle_buf: list = []

    def _run_buffered():
        # per-step fallback, preserving the exact (i+1) % freq update cadence
        nonlocal acc, i
        for mouse_id, batch in cycle_buf:
            acc, metrics = trainer.train_step(
                mouse_id,
                batch,
                acc_grads=acc,
                update=(i + 1) % update_frequency == 0,
            )
            i += 1
            for k, v in metrics.items():
                results[mouse_id].setdefault(k, []).append(v)
        cycle_buf.clear()

    for mouse_id, batch in _device_prefetch(trainer, iter(cyc)):
        cycle_buf.append((mouse_id, batch))
        if len(cycle_buf) < update_frequency:
            continue
        # CycleLoaders yields complete round-robin cycles, so the buffer
        # holds exactly one batch per mouse ending on an update boundary —
        # the fused path runs the whole cycle (grads + accumulation +
        # optimizer update) as ONE jitted call (see Trainer.train_cycle)
        if acc is None and trainer.cycle_fusible(cycle_buf):
            for (mid, _), metrics in zip(
                cycle_buf, trainer.train_cycle(cycle_buf)
            ):
                for k, v in metrics.items():
                    results[mid].setdefault(k, []).append(v)
            i += len(cycle_buf)
            cycle_buf.clear()
        else:
            _run_buffered()
    _run_buffered()  # tail (only if the loader yielded a partial cycle)
    return log_metrics(results, epoch=epoch, summary=summary, mode=0)


def validate(
    trainer: Trainer, ds: t.Dict[str, BatchLoader], epoch: int, summary=None
) -> dict:
    """Validation epoch (reference validate, train.py:158-190)."""
    results = {}
    for mouse_id, loader in ds.items():
        mouse_result: dict = {}
        y_true, y_pred = [], []
        for batch in loader:
            metrics, targets, predictions = trainer.validation_step(mouse_id, batch)
            for k, v in metrics.items():
                mouse_result.setdefault(k, []).append(v)
            y_true.append(targets)
            y_pred.append(predictions)
        y_true, y_pred = np.vstack(y_true), np.vstack(y_pred)
        mouse_result.update(compute_metrics(y_true=y_true, y_pred=y_pred))
        results[mouse_id] = mouse_result
    return log_metrics(results, epoch=epoch, summary=summary, mode=1)


def _materialize_metrics(results: dict) -> dict:
    """Pull every on-device metric scalar to the host in ONE stacked
    transfer. Fetching them one by one costs a device round-trip each —
    ~300 scalars/epoch at 6 mice — which dominates epoch wall time on
    remote-attached TPUs."""
    leaves, paths = [], []
    for mouse_id, metrics in results.items():
        for key, value in metrics.items():
            if isinstance(value, list):
                for i, item in enumerate(value):
                    if isinstance(item, jax.Array):
                        paths.append((mouse_id, key, i))
                        leaves.append(item)
    if leaves:
        values = np.asarray(jnp.stack(leaves))
        for (mouse_id, key, i), val in zip(paths, values):
            results[mouse_id][key][i] = float(val)
    return results


def log_metrics(results: dict, epoch: int, summary=None, mode: int = 0) -> dict:
    """Mean metrics per mouse then across mice (reference
    utils/utils.py:340-387); strips the metric-group prefix like the
    reference."""
    results = _materialize_metrics(results)
    mouse_ids = list(results.keys())
    metrics = list(results[mouse_ids[0]].keys())
    for mouse_id in mouse_ids:
        for metric in metrics:
            value = results[mouse_id][metric]
            if isinstance(value, list):
                results[mouse_id][metric] = float(np.mean(value))
            if summary is not None:
                summary.scalar(
                    f"{metric}/mouse{mouse_id}",
                    value=results[mouse_id][metric],
                    step=epoch,
                    mode=mode,
                )
    overall = {}
    for metric in metrics:
        value = float(np.mean([results[m][metric] for m in mouse_ids]))
        overall[metric[metric.find("/") + 1 :]] = value
        if summary is not None:
            summary.scalar(metric, value=value, step=epoch, mode=mode)
    return overall


def inference(
    trainer: Trainer, loader: BatchLoader, mouse_id: str
) -> t.Dict[str, np.ndarray]:
    """Full-dataset forward pass (reference utils/utils.py:59-100)."""
    results: dict = {"predictions": [], "targets": [], "trial_ids": [], "image_ids": []}
    for batch in loader:
        results["predictions"].append(trainer.predict(mouse_id, batch))
        results["targets"].append(batch["response"])
        results["image_ids"].append(batch["image_id"])
        results["trial_ids"].append(batch["trial_id"])
    return {
        k: np.concatenate(v, axis=0) for k, v in results.items()
    }


def evaluate(
    config: Config,
    trainer: Trainer,
    ds: t.Dict[str, BatchLoader],
    epoch: int = 0,
    summary=None,
    mode: int = 1,
    print_result: bool = False,
    save_result: t.Optional[str] = None,
) -> dict:
    """Challenge metrics per mouse + overall averages; writes
    evaluation.yaml (reference utils/utils.py:103-199)."""
    metric_names = ["single_trial_correlation", "correlation_to_average", "feve"]
    results: dict = {k: {} for k in metric_names}
    for mouse_id, loader in ds.items():
        if mouse_id in ("S0", "S1") and loader.dataset.tier == "test":
            continue
        outputs = inference(trainer, loader, mouse_id)
        mouse_metric = Metrics(
            outputs,
            neuron_ids=loader.dataset.neuron_ids,
            tier=loader.dataset.tier,
            hashed=loader.dataset.hashed,
        )
        results["single_trial_correlation"][mouse_id] = (
            mouse_metric.single_trial_correlation(per_neuron=True)
        )
        if mouse_metric.repeat_image and not mouse_metric.hashed:
            results["correlation_to_average"][mouse_id] = (
                mouse_metric.correlation_to_average(per_neuron=True)
            )
            results["feve"][mouse_id] = mouse_metric.feve(per_neuron=True)

    for metric in metric_names:
        for mouse_id in results[metric]:
            results[metric][mouse_id] = float(np.mean(results[metric][mouse_id]))
            if summary is not None:
                summary.scalar(
                    f"{metric}/mouse{mouse_id}",
                    value=results[metric][mouse_id],
                    step=epoch,
                    mode=mode,
                )

    if getattr(config, "verbose", 1) and print_result:
        statement = ""
        for metric in metric_names:
            if results[metric]:
                statement += f"\n{metric}\n"
                statement += "".join(
                    f"{k}: {v:.04f}\t" for k, v in results[metric].items()
                )
        if statement:
            print(statement)

    overall = {}
    for metric in metric_names:
        values = list(results[metric].values())
        if values:
            average = float(np.mean(values))
            overall[metric] = average
            results[metric]["average"] = average
            if summary is not None:
                summary.scalar(f"{metric}/average", value=average, step=epoch, mode=mode)

    if save_result is not None:
        os.makedirs(save_result, exist_ok=True)
        with open(os.path.join(save_result, "evaluation.yaml"), "w") as f:
            pyyaml.safe_dump(results, f)
    return overall
