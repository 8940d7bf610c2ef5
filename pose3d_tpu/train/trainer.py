"""Epoch-level trainers wiring loaders + jit steps + eval + ckpt + logs.

Flow parity (SURVEY.md §3):
  * TeacherTrainer.fit        — training.py:299-369: per-epoch train sweep,
    val_new (loss + contrastive val loss), per-category Acc/Med (ONE pass
    here instead of 20 dataset rebuilds), dual checkpointing (full model +
    image-encoder-only), txt log line + curve files.
  * KDTrainer.fit_crd         — trainingKD.py --crd -> _train_student_crd
    (base_class.py:303-449): 60-epoch student KD with 3-view batches,
    per-epoch category eval, checkpoint + best-acc save.
  * KDTrainer.fit_stage1/2    — base_class.py:451-688.

All device work happens inside jit'd steps; trainers only move numpy batches
to device (sharded over the mesh when one is given) and reduce metrics.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.data.loader import Prefetcher
from pose3d_tpu.parallel import pad_batch, shard_batch
from pose3d_tpu.train import steps as steps_lib
from pose3d_tpu.train.ckpt import Checkpointer
from pose3d_tpu.train.evaluate import evaluate_categories, CategoryEvalResult
from pose3d_tpu.utils import AverageValueMeter, TxtLogger, MetricsWriter
from pose3d_tpu.utils.logging import plot_curves


def _device_batch(batch: dict, valid, mesh) -> tuple[dict, "np.ndarray"]:
    """Pad the host batch to a device-count multiple and shard it.

    Padded rows replicate real samples and are marked invalid (parallel/mesh
    pad_batch); the jit steps mask them out of BN stats, losses, grads and
    metrics, so a non-dividing global batch (e.g. the reference's bs=46 on 8
    chips) uses every device instead of shrinking the mesh. The 'valid' key is
    attached to the device batch only when some row is actually padded — full
    batches keep the mask-free (cheaper) trace. Returns (device_batch,
    padded_host_valid)."""
    valid = np.asarray(valid, bool) if valid is not None else np.ones(
        len(next(iter(batch.values()))), bool)
    if mesh is not None:
        batch, valid = pad_batch(batch, valid, mesh.size)
    if not valid.all():
        batch = {**batch, "valid": valid}
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    else:
        # EXPLICIT device placement: without it the numpy batch is
        # transferred synchronously inside the jit call — in the consumer's
        # thread, serialized with dispatch — and the Prefetcher thread hides
        # nothing. Through the tunnel that transfer is ~260 ms per KD batch,
        # 3.7x the device step (docs/PERF.md round 4 "sustained training").
        batch = jax.device_put(batch)
    return batch, valid


# public name: the standalone eval CLIs (cli/testing.py) reuse the exact
# pad+shard+place policy the trainers use, so dataset-scale serving eval
# scales over the same DP mesh as training
device_batch = _device_batch


def _strip(batch: dict, keys) -> dict:
    return {k: batch[k] for k in keys if k in batch}


class _DeferredMeters:
    """Per-step device metrics WITHOUT per-step syncs: a float() after every
    step costs a ~24 ms tunnel roundtrip and — worse — blocks the dispatch
    pipeline, serializing transfer against compute (docs/PERF.md round 4
    "sustained training"). push() keeps the device scalars; flush()
    materializes them in two stacked transfers and feeds the meters, so
    running averages printed at flush boundaries are bit-identical to the
    old eager code. flush() also syncs every queued step — call it before
    taking wall-clock timestamps."""

    def __init__(self, loss_m: AverageValueMeter, acc_m: AverageValueMeter):
        self.loss_m, self.acc_m = loss_m, acc_m
        self._pending: list = []

    def push(self, metrics: dict, n: int) -> None:
        self._pending.append((metrics, n))

    def flush(self) -> None:
        if not self._pending:
            return
        losses = np.asarray(jnp.stack([m["loss"] for m, _ in self._pending]))
        accs = np.asarray(jnp.stack([m["acc_rot"] for m, _ in self._pending]))
        for (_, n), lo, ac in zip(self._pending, losses, accs):
            self.loss_m.update(float(lo), n)
            self.acc_m.update(float(ac), n)
        self._pending.clear()


class _Base:
    def __init__(self, result_path: str, mesh=None, logname: str = "training_log.txt",
                 profile_dir: str | None = None):
        self.result_path = result_path
        os.makedirs(result_path, exist_ok=True)
        self.mesh = mesh
        self.log = TxtLogger(os.path.join(result_path, logname))
        self.metrics = MetricsWriter(os.path.join(result_path, "metrics.jsonl"))
        self.ckpt = Checkpointer(os.path.join(result_path, "ckpt"))
        # profiling aux-subsystem (SURVEY.md §5 'Tracing / profiling'):
        # captures a jax.profiler trace of steps [5, 15) of the first epoch
        self.profile_dir = profile_dir
        self._profiled = False

    def _prefetch(self, loader, keys):
        """Overlap host batch prep + H2D transfer with device compute."""
        def place(b):
            return _device_batch(_strip(b, keys), b["valid"], self.mesh)

        return Prefetcher(loader, place, depth=2)

    def _maybe_profile(self, step_idx: int) -> None:
        if self.profile_dir is None or self._profiled:
            return
        import jax.profiler

        if step_idx == 5:
            jax.profiler.start_trace(self.profile_dir)
        elif step_idx == 15:
            jax.profiler.stop_trace()
            self._profiled = True
            print(f"profiler trace written to {self.profile_dir}")

    def _eval(self, eval_step, variables, eval_loader,
              category_names=None) -> CategoryEvalResult:
        # cat_id values are indices into the PRODUCING dataset's sorted
        # category list — always resolve names from that dataset
        if category_names is None or hasattr(eval_loader, "dataset"):
            names = getattr(eval_loader.dataset, "category_names", category_names)
        else:
            names = category_names

        def batches():
            for b in eval_loader:
                host = {k: v for k, v in b.items() if k != "valid"}
                db, hv = _device_batch(host, b["valid"], self.mesh)
                # label/cat_id come back padded to hv's length, matching the
                # step's pred length; evaluate_categories drops invalid rows
                yield {**db, "valid": hv}

        return evaluate_categories(eval_step, variables, batches(), names)


class TeacherTrainer(_Base):
    """Contrastive multimodal teacher training (training.py recipe)."""

    def __init__(self, model, state, train_loader, eval_loader, category_names,
                 result_path, bin_size: int = 15, mesh=None, print_freq: int = 50,
                 cat_eval_loader=None, device_augment: bool = False,
                 use_fused_nce: bool = False, shape_bank=None,
                 nce_variant: str = "info", nce_weighting: str = "linear"):
        """cat_eval_loader: optional second val loader for the per-category
        Acc/Med sweep. The reference computes val_new loss on its Pascal3D
        eval set but the per-category accuracies on Pascal3DContrast val
        subsets (training.py:310 vs 320-326) — pass both to reproduce that;
        defaults to eval_loader when omitted."""
        super().__init__(result_path, mesh)
        self.model = model
        self.state = state
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.cat_eval_loader = cat_eval_loader or eval_loader
        self.category_names = category_names
        self.print_freq = print_freq
        self.shape_bank = shape_bank
        self.train_step = _jit_step(
            partial(steps_lib.make_teacher_train_step, model, bin_size,
                    device_augment=device_augment,
                    use_fused_nce=use_fused_nce,
                    # under a mesh the Pallas NCE must run sharded (shard_map
                    # + feature all-gather) — a kernel won't GSPMD-partition
                    nce_mesh=mesh if use_fused_nce else None,
                    nce_variant=nce_variant, nce_weighting=nce_weighting),
            shape_bank, mesh, donate=(0,))
        self.eval_step = jax.jit(steps_lib.make_eval_step(model, "teacher", bin_size))

    def fit(self, epochs: int, start_epoch: int = 0, save_best: bool = True):
        best_acc = 0.0
        losses = np.zeros((epochs, 2))
        accuracies = np.zeros((epochs, 2))
        batch_keys = ("im", *_shape_batch_keys(self.shape_bank), "label")
        for epoch in range(start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            train_loss = AverageValueMeter()
            train_acc = AverageValueMeter()
            meters = _DeferredMeters(train_loss, train_acc)
            t0 = time.time()
            data_time = AverageValueMeter()
            batch_time = AverageValueMeter()
            end = time.time()
            for i, (db, valid) in enumerate(self._prefetch(self.train_loader,
                                                           batch_keys)):
                data_time.update(time.time() - end)
                self._maybe_profile(i)
                self.state, metrics = self.train_step(self.state, db)
                meters.push(metrics, int(valid.sum()))
                # dispatch cadence, not synced step time — steps queue ahead
                batch_time.update(time.time() - end)
                end = time.time()
                if (i + 1) % self.print_freq == 0:
                    meters.flush()  # running averages stay print-exact
                    print(f"\tEpoch {epoch:3d} --- Iter [{i + 1}/{len(self.train_loader)}] "
                          f"Train loss: {train_loss.avg:.2f} || Train accuracy: {train_acc.avg:.2f}")
                    print(f"\tData loading time: {data_time.val:.2f} ({data_time.avg:.2f})"
                          f"-- Batch time: {batch_time.val:.2f} ({batch_time.avg:.2f})\n")
            meters.flush()

            variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            result = self._eval(self.eval_step, variables, self.eval_loader,
                                self.category_names)
            if self.cat_eval_loader is not self.eval_loader:
                cat_result = self._eval(self.eval_step, variables,
                                        self.cat_eval_loader, self.category_names)
                eval_acc = cat_result.mean_acc
            else:
                eval_acc = result.mean_acc

            is_best = eval_acc > best_acc
            best_acc = max(best_acc, eval_acc)
            losses[epoch] = [train_loss.avg, result.val_loss]
            accuracies[epoch] = [train_acc.avg, eval_acc]

            # dual checkpointing: full model + image-encoder-only
            # (training.py:334-350)
            self.ckpt.save_epoch(epoch, {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            }, is_best=is_best and save_best)
            img_encoder = _extract_img_encoder(self.state.params, self.state.batch_stats)
            if img_encoder is not None:
                self.ckpt.save("checkpoint_img_encoder", img_encoder)
                if is_best and save_best:
                    self.ckpt.save("best_img_encoder", img_encoder)

            self.log.line(
                "Epoch: %03d || train_loss %.2f -- val_loss %.2f || train_acc %.2f -- "
                "val_acc %.2f -- val_contrastive_loss %.2f \n" %
                (epoch, train_loss.avg, result.val_loss, train_acc.avg, eval_acc,
                 result.val_nce_loss))
            self.metrics.write({"kind": "teacher_epoch", "epoch": epoch,
                                "train_loss": train_loss.avg, "train_acc": train_acc.avg,
                                "val_loss": result.val_loss, "val_acc": eval_acc,
                                "val_nce": result.val_nce_loss,
                                "epoch_seconds": time.time() - t0,
                                "per_category_acc": result.per_category_acc})
            plot_curves(self.result_path, losses, accuracies, epoch)
        return best_acc


class SupervisedTrainer(_Base):
    """Plain 4-term pose-loss training (training.py:92-148 `train_vanilla`):
    the RGB-only BaselineEstimator baseline (--shape None) or a
    PoseEstimatorVanilla teacher."""

    def __init__(self, model, state, train_loader, eval_loader, category_names,
                 result_path, kind: str = "student", bin_size: int = 15, mesh=None,
                 print_freq: int = 50, shape_bank=None):
        super().__init__(result_path, mesh)
        self.model = model
        self.state = state
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.category_names = category_names
        self.print_freq = print_freq
        has_shape = kind != "student"
        self.batch_keys = (
            ("im", *_shape_batch_keys(shape_bank), "label") if has_shape
            else ("im", "label"))
        self.train_step = _jit_step(
            partial(steps_lib.make_vanilla_train_step, model, has_shape,
                    bin_size),
            shape_bank, mesh, donate=(0,))
        self.eval_step = jax.jit(steps_lib.make_eval_step(model, kind, bin_size))

    def fit(self, epochs: int, start_epoch: int = 0):
        best_acc = 0.0
        losses = np.zeros((epochs, 2))
        accuracies = np.zeros((epochs, 2))
        for epoch in range(start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            loss_m, acc_m = AverageValueMeter(), AverageValueMeter()
            meters = _DeferredMeters(loss_m, acc_m)
            t0 = time.time()
            for i, (db, valid) in enumerate(self._prefetch(self.train_loader,
                                                           self.batch_keys)):
                self._maybe_profile(i)
                self.state, metrics = self.train_step(self.state, db)
                meters.push(metrics, int(valid.sum()))
                if (i + 1) % self.print_freq == 0:
                    meters.flush()
                    print(f"\tEpoch {epoch:3d} --- Iter [{i + 1}/{len(self.train_loader)}] "
                          f"Train loss: {loss_m.avg:.2f} || Train accuracy: {acc_m.avg:.2f}")
            meters.flush()

            variables = {"params": self.state.params,
                         "batch_stats": self.state.batch_stats}
            result = self._eval(self.eval_step, variables, self.eval_loader,
                                self.category_names)
            is_best = result.mean_acc > best_acc
            best_acc = max(best_acc, result.mean_acc)
            losses[epoch] = [loss_m.avg, result.val_loss]
            accuracies[epoch] = [acc_m.avg, result.mean_acc]
            self.ckpt.save_epoch(epoch, {"params": self.state.params,
                                         "batch_stats": self.state.batch_stats,
                                         "opt_state": self.state.opt_state},
                                 is_best=is_best)
            self.log.line(
                "Epoch: %03d || train_loss %.2f -- val_loss %.2f || train_acc %.2f -- "
                "val_acc %.2f \n" %
                (epoch, loss_m.avg, result.val_loss, acc_m.avg, result.mean_acc))
            self.metrics.write({"kind": "supervised_epoch", "epoch": epoch,
                                "train_loss": loss_m.avg, "train_acc": acc_m.avg,
                                "val_acc": result.mean_acc, "val_med": result.mean_med,
                                "epoch_seconds": time.time() - t0})
            plot_curves(self.result_path, losses, accuracies, epoch)
        return best_acc


def _jit_step(make_fn, shape_bank, mesh, donate=(), **kw):
    """jit a step factory, binding an optional device-resident shape bank.

    The bank is passed to the jitted step as its first TRACED argument —
    never a closure: a closed-over bank is embedded as HLO literals and the
    remote compiler const-folds for minutes per process (measured 468 s vs
    16.6 s for a 41 MB render bank, docs/PERF.md round 4 — the same failure
    mode as the round-3 int8 calibration params). Placed/replicated here
    ONCE; callers keep the original (state, batch) call signature."""
    if shape_bank is None:
        return jax.jit(make_fn(**kw), donate_argnums=donate)
    raw = make_fn(with_shape_bank=True, **kw)
    jstep = jax.jit(raw, donate_argnums=tuple(d + 1 for d in donate))
    if mesh is not None:
        from pose3d_tpu.parallel import replicate

        bank_dev = replicate(shape_bank, mesh)
    else:
        bank_dev = jax.device_put(shape_bank)
    return lambda *a, **k: jstep(bank_dev, *a, **k)


def _shape_batch_keys(shape_bank):
    """The loader keys that carry the shape: the cloud/render stack itself,
    or the bank's scalar reference keys in device_shapes mode
    (ops/shape_bank.py — ShapeBank vs RenderBank carry different keys)."""
    if shape_bank is not None:
        return shape_bank.batch_keys
    return ("shape",)


def _extract_img_encoder(params, batch_stats):
    """Pull the image-encoder subtree if present (ResNet_0 inside the teacher,
    VGG_0 inside the student)."""
    for key in ("ResNet_0", "VGG_0"):
        if key in params:
            return {"params": params[key],
                    "batch_stats": batch_stats.get(key, {}) if hasattr(batch_stats, "get") else {}}
    return None


class KDTrainer(_Base):
    """Distiller covering the --crd / stage-1 / stage-2 / vanilla regimes."""

    def __init__(self, student_model, teacher_model, student_state, teacher_vars,
                 train_loader, eval_loader, category_names, result_path,
                 bin_size: int = 15, temperature: float = 1.0, tau: float = 0.5,
                 mesh=None, teacher_state=None, device_augment: bool = False,
                 device_views: bool = False, int8_teacher: bool = False,
                 use_fused_nce: bool = False, shape_bank=None,
                 nce_variant: str = "info", nce_weighting: str = "linear"):
        super().__init__(result_path, mesh)
        self.student_model = student_model
        self.teacher_model = teacher_model
        self.student_state = student_state
        self.teacher_vars = teacher_vars
        self.teacher_state = teacher_state
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.category_names = category_names
        self.bin_size = bin_size
        self.temperature = temperature
        self.tau = tau
        self.device_augment = device_augment
        self.device_views = device_views
        # int8 frozen teacher (--crd only): teacher_vars is then
        # {"variables": tv, "q8": quantized resnet} — steps.make_kd_crd_step
        self.int8_teacher = int8_teacher
        # stage-1 only today: routes the symmetric NCE through the Pallas
        # selector (steps.route_info_nce) — the wide-DP Gram regime
        self.use_fused_nce = use_fused_nce
        # stage-1 contrastive variant: 'info' or the pose-weighted family
        # (the `--weighting` consumer — steps.make_stage1_step)
        self.nce_variant = nce_variant
        self.nce_weighting = nce_weighting
        # device-resident cloud bank (ops/shape_bank.py): the train loader
        # then emits (shape_id, shape_rot, shape_seed) instead of clouds
        self.shape_bank = shape_bank
        self.student_eval_step = jax.jit(
            steps_lib.make_eval_step(student_model, "student", bin_size))

    def _view_keys(self):
        shape_keys = _shape_batch_keys(self.shape_bank)
        if self.device_views:
            return ("im", *shape_keys, "label", "label_flip", "label_rot",
                    "rot_sign")
        return ("im", *shape_keys, "label", "im_flip", "label_flip", "im_rot",
                "label_rot")

    # ---------------- crd (the main student path) ----------------
    def fit_crd(self, epochs: int, start_epoch: int = 0,
                loss_variant: str = "crd"):
        """loss_variant: 'crd' | 'contrast' (no feature-KL) | 'vid' — see
        steps.make_kd_crd_step."""
        step = _jit_step(
            partial(steps_lib.make_kd_crd_step,
                    self.student_model, self.teacher_model, self.bin_size,
                    self.temperature, device_augment=self.device_augment,
                    device_views=self.device_views,
                    int8_teacher=self.int8_teacher,
                    loss_variant=loss_variant),
            self.shape_bank, self.mesh, donate=(0,))
        return self._student_loop(step, self._view_keys(), epochs, start_epoch,
                                  loss_variant if loss_variant != "crd" else "crd")

    # ---------------- stage 2 ----------------
    def fit_stage2(self, epochs: int, start_epoch: int = 0):
        step = _jit_step(
            partial(steps_lib.make_stage2_step,
                    self.student_model, self.teacher_model, self.bin_size,
                    self.temperature, device_views=self.device_views,
                    int8_teacher=self.int8_teacher),
            self.shape_bank, self.mesh, donate=(0,))
        return self._student_loop(step, self._view_keys(), epochs, start_epoch,
                                  "stage2")

    def _student_loop(self, step, keys, epochs, start_epoch, tag):
        best_acc = 0.0
        for epoch in range(start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            loss_m, acc_m = AverageValueMeter(), AverageValueMeter()
            meters = _DeferredMeters(loss_m, acc_m)
            t0 = time.time()
            for i, (db, valid) in enumerate(self._prefetch(self.train_loader, keys)):
                self._maybe_profile(i)
                self.student_state, metrics = step(self.student_state,
                                                   self.teacher_vars, db)
                meters.push(metrics, int(valid.sum()))
            # the flush syncs the last step, so train_seconds stays an honest
            # device-inclusive time; sustained samples/s = train_samples /
            # train_seconds, the number to hold against the device-step
            # ceiling (docs/PERF.md)
            meters.flush()
            train_seconds = time.time() - t0

            variables = {"params": self.student_state.params,
                         "batch_stats": self.student_state.batch_stats}
            result = self._eval(self.student_eval_step, variables, self.eval_loader,
                                self.category_names)

            is_best = result.mean_acc > best_acc
            best_acc = max(best_acc, result.mean_acc)
            self.ckpt.save_epoch(epoch, {"params": self.student_state.params,
                                         "batch_stats": self.student_state.batch_stats},
                                 is_best=is_best)

            self.log.line(
                "Student Epoch: %03d || train_loss %.2f || train_acc %.2f -- "
                "val_acc %.2f -- val_med %.2f \n" %
                (epoch + 1, loss_m.avg, acc_m.avg, result.mean_acc, result.mean_med))
            self.metrics.write({"kind": f"{tag}_epoch", "epoch": epoch,
                                "train_loss": loss_m.avg, "train_acc": acc_m.avg,
                                "val_acc": result.mean_acc, "val_med": result.mean_med,
                                "epoch_seconds": time.time() - t0,
                                "train_seconds": round(train_seconds, 3),
                                "train_samples": loss_m.count,
                                "train_samples_per_s": round(
                                    loss_m.count / max(train_seconds, 1e-9), 2)})
        return best_acc

    # ---------------- stage 1 (joint teacher + learner) ----------------
    def fit_stage1(self, epochs: int, start_epoch: int = 0,
                   use_memory_bank: bool = False, memory_bank_size: int = 4096):
        """use_memory_bank: the MoCo-style queue EXTENSION (the reference's
        NCE is in-batch only) — the negative pool is enlarged with past
        teacher features; the bank rides along as explicit step state."""
        assert self.teacher_state is not None, "stage 1 trains the teacher too"
        step = _jit_step(
            partial(steps_lib.make_stage1_step,
                    self.teacher_model, self.student_model, self.bin_size,
                    self.tau, use_memory_bank=use_memory_bank,
                    use_fused_nce=self.use_fused_nce,
                    nce_mesh=self.mesh if self.use_fused_nce else None,
                    nce_variant=self.nce_variant,
                    nce_weighting=self.nce_weighting),
            self.shape_bank, self.mesh, donate=(0, 1))
        bank = None
        if use_memory_bank:
            from pose3d_tpu.losses import init_memory_bank

            bank = init_memory_bank(memory_bank_size, 200)
        if start_epoch > 0 and self.ckpt.exists("checkpoint"):
            # resume: restore BOTH model states and (if present) the memory
            # bank — without the bank the negative pool would silently restart
            # cold, changing the effective loss across the restart (ADVICE r2)
            import jax.numpy as jnp

            restored = self.ckpt.restore("checkpoint")
            self.teacher_state = self.teacher_state.replace(
                params=restored["teacher"]["params"],
                batch_stats=restored["teacher"]["batch_stats"])
            self.student_state = self.student_state.replace(
                params=restored["student"]["params"],
                batch_stats=restored["student"]["batch_stats"])
            if use_memory_bank:
                if "bank" in restored:
                    from pose3d_tpu.losses.memory_bank import MemoryBank

                    bank = MemoryBank(
                        queue=jnp.asarray(restored["bank"]["queue"]),
                        ptr=jnp.asarray(restored["bank"]["ptr"], jnp.int32),
                        filled=jnp.asarray(restored["bank"]["filled"], jnp.int32))
                else:
                    self.log.line("WARNING: resuming stage 1 without a saved "
                                  "memory bank — the negative queue restarts "
                                  "cold\n")
        keys = ("im", *_shape_batch_keys(self.shape_bank), "label")
        teacher_eval_step = jax.jit(
            steps_lib.make_eval_step(self.teacher_model, "vanilla", self.bin_size))
        best_acc = 0.0
        for epoch in range(start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            loss_m, acc_m = AverageValueMeter(), AverageValueMeter()
            meters = _DeferredMeters(loss_m, acc_m)
            for i, (db, valid) in enumerate(self._prefetch(self.train_loader, keys)):
                self._maybe_profile(i)
                if use_memory_bank:
                    (self.teacher_state, self.student_state, metrics,
                     bank) = step(self.teacher_state, self.student_state, db, bank)
                else:
                    self.teacher_state, self.student_state, metrics = step(
                        self.teacher_state, self.student_state, db)
                meters.push(metrics, int(valid.sum()))
            meters.flush()

            variables = {"params": self.teacher_state.params,
                         "batch_stats": self.teacher_state.batch_stats}
            result = self._eval(teacher_eval_step, variables, self.eval_loader,
                                self.category_names)
            is_best = result.mean_acc > best_acc
            best_acc = max(best_acc, result.mean_acc)
            tree = {
                "teacher": {"params": self.teacher_state.params,
                            "batch_stats": self.teacher_state.batch_stats},
                "student": {"params": self.student_state.params,
                            "batch_stats": self.student_state.batch_stats},
            }
            if use_memory_bank:
                tree["bank"] = {"queue": bank.queue, "ptr": bank.ptr,
                                "filled": bank.filled}
            self.ckpt.save_epoch(epoch, tree, is_best=is_best)
            self.log.line(
                "Student Epoch: %03d || train_loss %.2f || train_acc %.2f -- "
                "val_acc %.2f -- val_med %.2f \n" %
                (epoch + 1, loss_m.avg, acc_m.avg, result.mean_acc, result.mean_med))
            self.metrics.write({"kind": "stage1_epoch", "epoch": epoch,
                                "train_loss": loss_m.avg, "val_acc": result.mean_acc})
        return best_acc
