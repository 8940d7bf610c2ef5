"""jit-compiled train/eval steps for every training regime in the reference.

Regime map (SURVEY.md §3, /root/reference):
  * make_teacher_train_step   — training.py:26-88 `train()`: 4-term pose loss
    + 0.5 * infoNCE_KD(img_features, fused_features, tau=0.1).
  * make_vanilla_train_step   — training.py:92-148 `train_vanilla()`: 4-term
    pose loss only (BaselineEstimator supervised or PoseEstimator_Vanilla).
  * make_kd_crd_step          — KD/common/base_class.py:303-449
    `_train_student_crd`: concat the 3 augmentation views into a 3b batch,
    tile shapes x3, student fwd (train) + frozen teacher fwd (eval,
    stop_gradient), loss = calculate_kd_loss_new (0.25 gt + 0.75 sum KL +
    0.75 feature KL).
  * make_stage1_step          — base_class.py:451-569 `_train_stage_1`: joint
    teacher (vanilla arity) + contrastive learner; teacher pose loss + 0.75 *
    symmetric infoNCE_KD; both models step.
  * make_stage2_step          — base_class.py:571-688 `_train_stage_2`:
    response KD from a frozen stage-1 teacher (0.25 gt + 0.75 sum KL).
  * make_eval_step            — evaluation.py:11-117 val/val_new: loss + the
    train/val decoder + predictions.

Design: every step is a pure function (state, batch) -> (state, metrics),
built once per model by a `make_*` factory and jit-compiled by the caller
(jit + GSPMD over a Mesh gives DP, global-batch NCE and sync-BN for free —
see pose3d_tpu.parallel.mesh). Teacher freezing uses stop_gradient instead of
the reference's compute-grads-then-ignore (base_class.py:363) — identical
updates, fewer FLOPs. Heads are cast to float32 before any loss for bf16
safety.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from pose3d_tpu import geometry
from pose3d_tpu.ops.augment import dewire
from pose3d_tpu.losses import (
    info_nce_kd,
    info_nce_kd_per_sample,
    kd_loss,
    kd_loss_with_features,
    pose_loss,
    pose_loss_per_sample,
)

Batch = dict[str, jnp.ndarray]


def _f32(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float32), tree)


def _train_metrics(outputs, labels, bin_size, valid=None):
    preds = geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]), bin_size)
    acc = geometry.rotation_acc(preds, labels.astype(jnp.float32), valid=valid)
    return preds, acc


def _valid_of(batch: Batch):
    """Per-sample validity mask, or None when the batch carries none.

    Padded rows (ragged tails / device-count padding, parallel/mesh.pad_batch)
    are excluded from BatchNorm statistics (mask= on every BN), every loss
    term and the accuracy — the step's numerics on the valid rows are then
    identical to an unpadded run."""
    v = batch.get("valid")
    return None if v is None else v.astype(bool)


def _shape_of(batch: Batch, bank):
    """batch["shape"], or the shape resolved ON DEVICE from a bank reference
    when the loader runs device_shapes mode (a few scalars per sample instead
    of a cloud/render transfer — ops/shape_bank.py; clouds are sampled
    in-step, render views are a deterministic id-table gather).

    The bank MUST reach the jitted step as a traced ARGUMENT, never a
    closure: closing over it embeds the whole bank as HLO literals and the
    remote compiler const-folds for minutes per process (measured 468 s vs
    16.6 s for a 41 MB render bank — docs/PERF.md round 4; same failure mode
    as the round-3 int8 params). Factories therefore take
    `with_shape_bank=True` and return a step whose FIRST argument is the
    bank pytree."""
    if bank is not None and "shape_id" in batch:
        from pose3d_tpu.ops import shape_bank as _sb

        return _sb.resolve(bank, batch)
    return batch.get("shape")


# widest batch whose b^2 Gram still fits the single-block kernel's VMEM;
# above it the blocked online-LSE kernel streams O(N*D) instead
_SINGLE_BLOCK_NCE_MAX = 1024
_BLOCKED_NCE_BLOCK = 1024  # measured-best v5e tile (docs/PERF.md round 4)


def route_info_nce(feat_q, feat_k, tau, dropout_rng, dropout_rate, valid,
                   use_fused: bool, mesh=None, mesh_axis: str = "data"):
    """The ONE in-batch infoNCE-KD selector, shared by every call site
    (teacher step and stage-1 symmetric NCE — reference
    model_utils.py:263-285, base_class.py:451-569).

    use_fused=False -> the XLA lowering (losses.info_nce_kd). use_fused=True
    -> dropout applied here (bit-identical bernoulli draw to the XLA path's
    internal one), then:
      * mesh given -> the DATA-PARALLEL route: shard_map + explicit feature
        all-gather around the rectangular blocked kernel
        (parallel/nce_shard.sharded_info_nce) — a Pallas call does not GSPMD-
        partition on its own, so this is how the kernel runs multi-chip;
        handles masks natively (padded DP batches included).
      * no mesh, by width: <= _SINGLE_BLOCK_NCE_MAX unmasked batches take the
        single-block Pallas kernel; wider batches — masked or not — stream
        through the blocked online-LSE kernel (ops/nce_blocked.py). Narrow
        masked batches stay on XLA (the single-block kernel has no masking,
        and at those widths both are dispatch-bound anyway)."""
    if not use_fused:
        return info_nce_kd(feat_q, feat_k, tau, dropout_rng=dropout_rng,
                           dropout_rate=dropout_rate, valid=valid)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    feat_k.shape)
        feat_k = jnp.where(keep, feat_k / (1.0 - dropout_rate), 0.0)
    if mesh is not None:
        from pose3d_tpu.parallel.nce_shard import sharded_info_nce

        return sharded_info_nce(feat_q, feat_k, tau, mesh, mesh_axis,
                                valid=valid, block=_BLOCKED_NCE_BLOCK)
    if feat_q.shape[0] > _SINGLE_BLOCK_NCE_MAX:
        from pose3d_tpu.ops.nce_blocked import blocked_info_nce

        return blocked_info_nce(feat_q, feat_k, tau, _BLOCKED_NCE_BLOCK,
                                None, valid=valid)
    if valid is not None:
        return info_nce_kd(feat_q, feat_k, tau, dropout_rng=None,
                           dropout_rate=0.0, valid=valid)
    from pose3d_tpu.ops.nce_fused import fused_info_nce

    return fused_info_nce(feat_q, feat_k, tau, None)


# --------------------------------------------------------------------------
# Teacher training (contrastive multimodal teacher) — training.py:26-88
# --------------------------------------------------------------------------
def make_teacher_train_step(
    model,
    bin_size: int = 15,
    nce_weight: float = 0.5,
    nce_tau: float = 0.1,
    nce_dropout: float = 0.3,
    use_fused_nce: bool = False,
    device_augment: bool = False,
    with_shape_bank: bool = False,
    nce_mesh=None,
    nce_variant: str = "info",
    nce_weighting: str = "linear",
) -> Callable:
    """use_fused_nce routes the contrastive term through the Pallas kernels
    via route_info_nce (identical math; dropout applied outside the kernel);
    pass nce_mesh (the DP Mesh) with it so the kernel runs sharded under
    GSPMD (shard_map + feature all-gather) instead of single-device.
    device_augment expects RAW [0,1] pixels from the loader (datasets built
    with host_augment=False) and applies the photometric augs + normalize
    on-device (ops/augment.py) — the host-bottleneck fix.
    with_shape_bank: the returned step takes the device-resident bank as its
    FIRST argument (see _shape_of for why it must be an argument) and the
    batch carries the bank's scalar reference keys.
    nce_variant selects the contrastive term: 'info' (infoNCE_KD — what the
    reference recipes run, model_utils.py:263-285), 'pose' (pose_nce_kd:
    negatives down-weighted by pairwise geodesic pose distance per
    `nce_weighting` — model_utils.py:225-261; implemented in the reference
    but unreachable from any live recipe, wired here as an opt-in), or
    'multipose' (multi_pose_nce_kd, 30-deg multi-positive —
    model_utils.py:306-351). The pose variants carry no dropout (reference
    parity) and take the XLA lowering (use_fused_nce applies to 'info')."""
    if nce_variant not in ("info", "pose", "multipose"):
        raise ValueError(f"unknown nce_variant: {nce_variant!r}")

    def _nce(img_proj, fused, labels, nce_rng, valid):
        if nce_variant == "pose":
            from pose3d_tpu.losses import pose_nce_kd

            return pose_nce_kd(img_proj, fused, labels.astype(jnp.float32),
                               nce_tau, nce_weighting, valid=valid)
        if nce_variant == "multipose":
            from pose3d_tpu.losses import multi_pose_nce_kd

            return multi_pose_nce_kd(img_proj, fused,
                                     labels.astype(jnp.float32),
                                     nce_tau, valid=valid)
        return route_info_nce(img_proj, fused, nce_tau, nce_rng, nce_dropout,
                              valid, use_fused_nce, mesh=nce_mesh)

    def loss_fn(params, batch_stats, batch: Batch, rng, bank):
        drop_rng, nce_rng, aug_rng = jax.random.split(rng, 3)
        valid = _valid_of(batch)
        im = dewire(batch["im"])  # u8 wire -> exact [0,1] f32 (4x transfer cut)
        if device_augment:
            from pose3d_tpu.ops.augment import device_augment as _aug

            im = _aug(im, aug_rng)
        (outputs, fused, img_proj), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            im, _shape_of(batch, bank), train=True, mask=valid,
            rngs={"dropout": drop_rng},
            mutable=["batch_stats"],
        )
        outputs = _f32(outputs)
        fused = fused.astype(jnp.float32)
        img_proj = img_proj.astype(jnp.float32)
        gt = pose_loss(outputs, batch["label"], bin_size, valid=valid)
        nce = _nce(img_proj, fused, batch["label"], nce_rng, valid)
        loss = gt + nce_weight * nce
        return loss, (outputs, mutated["batch_stats"], gt, nce)

    def raw_step(bank, state, batch: Batch):
        rng, new_rng = jax.random.split(state.rng)
        (loss, (outputs, new_bs, gt, nce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng, bank)
        state = state.apply_gradients(grads, new_batch_stats=new_bs, new_rng=new_rng)
        _, acc = _train_metrics(outputs, batch["label"], bin_size, _valid_of(batch))
        return state, {"loss": loss, "pose_loss": gt, "nce_loss": nce, "acc_rot": acc}

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)


# --------------------------------------------------------------------------
# Vanilla supervised training — training.py:92-148
# --------------------------------------------------------------------------
def make_vanilla_train_step(model, has_shape: bool, bin_size: int = 15,
                            with_shape_bank: bool = False) -> Callable:
    def loss_fn(params, batch_stats, batch: Batch, rng, bank):
        valid = _valid_of(batch)
        im = dewire(batch["im"])
        args = (im, _shape_of(batch, bank)) if has_shape else (im,)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            *args, train=True, mask=valid,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        outputs = _f32(out[0])
        gt = pose_loss(outputs, batch["label"], bin_size, valid=valid)
        return gt, (outputs, mutated["batch_stats"])

    def raw_step(bank, state, batch: Batch):
        rng, new_rng = jax.random.split(state.rng)
        (loss, (outputs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng, bank
        )
        state = state.apply_gradients(grads, new_batch_stats=new_bs, new_rng=new_rng)
        _, acc = _train_metrics(outputs, batch["label"], bin_size, _valid_of(batch))
        return state, {"loss": loss, "acc_rot": acc}

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)


# --------------------------------------------------------------------------
# KD --crd: the main student path — base_class.py:303-449
# --------------------------------------------------------------------------
def make_kd_crd_step(
    student_model,
    teacher_model,
    bin_size: int = 15,
    temperature: float = 1.0,
    device_augment: bool = False,
    device_views: bool = False,
    int8_teacher: bool = False,
    with_shape_bank: bool = False,
    loss_variant: str = "crd",
) -> Callable:
    """step(student_state, teacher_variables, batch7) -> (student_state, metrics)
    — or step(bank, student_state, teacher_variables, batch) with
    with_shape_bank=True (see _shape_of: the bank must be an argument).

    loss_variant: 'crd' (calculate_kd_loss_new, vanilla_kd.py:143-164 — the
    main recipe), 'contrast' (the same minus the feature-KL term — the
    closest live semantics for the reference's --contrast flag, whose
    dispatch targets a method that does not exist, trainingKD.py:281), or
    'vid' (calculate_vid_loss, vanilla_kd.py:167-195 — dormant in the
    reference, wired here as an opt-in).

    batch7 keys: im, shape, label, im_flip, label_flip, im_rot, label_rot.
    device_augment: see make_teacher_train_step.
    device_views: the batch carries ONE raw view (+ rot_sign) and the flip /
    +-15 deg rotated views are synthesized here (ops/augment.synthesize_views)
    — implies device photometrics+normalize regardless of device_augment
    (the loader emits raw pixels in this mode).
    int8_teacher: run the FROZEN teacher's resnet50 image encoder through the
    int8 PTQ path (serving/quant_teacher.py) — the teacher fwd is pure
    eval-mode inference inside this step, so serving-style quantization
    applies; the step then takes teacher_variables = {"variables": tv,
    "q8": quantize_teacher_resnet(tv, ...)}. A deliberate approximation of
    the reference recipe (teacher logits/features carry ~0.5% int8 error);
    opt-in, with the accuracy-drift evidence in tests/test_quant_teacher.py
    and docs/PERF.md.
    """
    if loss_variant not in ("crd", "contrast", "vid"):
        raise ValueError(f"unknown loss_variant: {loss_variant!r}")
    if int8_teacher:
        from pose3d_tpu.serving.quant_teacher import make_teacher_int8_kd_fwd

        int8_fwd = make_teacher_int8_kd_fwd(teacher_model)

    def loss_fn(params, batch_stats, teacher_vars, batch: Batch, rng, bank):
        valid = _valid_of(batch)
        valid3 = None if valid is None else jnp.concatenate([valid] * 3, axis=0)
        if device_views:
            from pose3d_tpu.ops.augment import synthesize_views

            im = synthesize_views(dewire(batch["im"]), batch["rot_sign"])
        else:
            im = dewire(jnp.concatenate(
                [batch["im"], batch["im_flip"], batch["im_rot"]], axis=0))
        label = jnp.concatenate(
            [batch["label"], batch["label_flip"], batch["label_rot"]], axis=0
        )
        rng, aug_rng = jax.random.split(rng)
        if device_augment or device_views:
            from pose3d_tpu.ops.augment import device_augment as _aug

            im = _aug(im, aug_rng)

        (s_out, s_feat), mutated = student_model.apply(
            {"params": params, "batch_stats": batch_stats},
            im, train=True, mask=valid3,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        # view_tile=3: the 3 augmentation views share their point clouds, so
        # the frozen teacher's shape encoder runs once on the unique shapes
        # and tiles its features — exact with eval-mode BN, and it removes a
        # redundant 2x PointNet forward (2500 pts x 1024 dim) per step
        shape = _shape_of(batch, bank)
        if int8_teacher:
            t_out, t_feat = int8_fwd(teacher_vars["q8"],
                                     teacher_vars["variables"],
                                     im, shape, view_tile=3)
        else:
            t_out, _, t_feat = teacher_model.apply(teacher_vars, im, shape,
                                                   train=False, view_tile=3)
        # frozen teacher: identical update to the reference's
        # grads-computed-then-ignored (base_class.py:363), minus wasted FLOPs
        t_out = jax.tree.map(jax.lax.stop_gradient, t_out)
        t_feat = jax.lax.stop_gradient(t_feat)

        s_out, t_out = _f32(s_out), _f32(t_out)
        s_feat, t_feat = s_feat.astype(jnp.float32), t_feat.astype(jnp.float32)

        gt = pose_loss(s_out, label, bin_size, valid=valid3)
        if loss_variant == "vid":
            from pose3d_tpu.losses import vid_loss

            loss = vid_loss(s_out, t_out, gt, s_feat, t_feat,
                            temperature=temperature, valid=valid3)
        elif loss_variant == "contrast":
            loss = kd_loss(s_out, t_out, gt, temperature=temperature,
                           valid=valid3)
        else:
            loss = kd_loss_with_features(s_out, t_out, s_feat, t_feat, gt,
                                         temperature=temperature, valid=valid3)
        return loss, (s_out, label, valid3, mutated["batch_stats"], gt)

    def raw_step(bank, student_state, teacher_vars, batch: Batch):
        rng, new_rng = jax.random.split(student_state.rng)
        (loss, (s_out, label, valid3, new_bs, gt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(student_state.params, student_state.batch_stats, teacher_vars, batch,
          rng, bank)
        student_state = student_state.apply_gradients(
            grads, new_batch_stats=new_bs, new_rng=new_rng
        )
        _, acc = _train_metrics(s_out, label, bin_size, valid3)
        return student_state, {"loss": loss, "gt_loss": gt, "acc_rot": acc}

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)


# --------------------------------------------------------------------------
# Stage 1: joint teacher + contrastive learner — base_class.py:451-569
# --------------------------------------------------------------------------
def make_stage1_step(
    teacher_model,
    student_model,
    bin_size: int = 15,
    tau: float = 0.5,
    nce_weight: float = 0.75,
    use_memory_bank: bool = False,
    use_fused_nce: bool = False,
    with_shape_bank: bool = False,
    nce_mesh=None,
    nce_variant: str = "info",
    nce_weighting: str = "linear",
) -> Callable:
    """Both models train. step(teacher_state, student_state, batch[, bank]) ->
    (teacher_state, student_state, metrics[, bank]). Teacher must have vanilla
    arity ([6], feat) — base_class.py:494.

    use_memory_bank=True is the OPTIONAL extension beyond the reference
    (SURVEY.md §5 note): the symmetric NCE's negative pool is enlarged by a
    MoCo-style FIFO queue of past features (losses/memory_bank.py); the step
    then takes/returns a MemoryBank and enqueues the teacher features.

    use_fused_nce routes both directions of the symmetric NCE through the
    same route_info_nce selector as the teacher step (pass nce_mesh for the
    sharded multi-chip route) — at wide DP (bs160 x 16+ chips) the stage-1
    Gram hits the same N^2 wall the blocked kernel solves
    (base_class.py:451-569). Ignored by the memory-bank branch (the bank
    loss has a different key pool).

    nce_variant: 'info' (default — the reference's symmetric infoNCE_KD) or
    'pose'/'multipose' (the pose-weighted family, model_utils.py:225-261 /
    306-351 — dead code in the reference, wired here as the opt-in
    `--weighting` consumer; incompatible with use_memory_bank)."""
    if nce_variant not in ("info", "pose", "multipose"):
        raise ValueError(f"unknown nce_variant: {nce_variant!r}")
    if use_memory_bank and nce_variant != "info":
        raise ValueError("pose-weighted NCE has no memory-bank form "
                         "(the queue holds no pose labels)")

    def _sym_nce(q, k, labels, rng, valid):
        if nce_variant == "pose":
            from pose3d_tpu.losses import pose_nce_kd

            return pose_nce_kd(q, k, labels.astype(jnp.float32), tau,
                               nce_weighting, valid=valid)
        if nce_variant == "multipose":
            from pose3d_tpu.losses import multi_pose_nce_kd

            return multi_pose_nce_kd(q, k, labels.astype(jnp.float32), tau,
                                     valid=valid)
        return route_info_nce(q, k, tau, rng, 0.3, valid, use_fused_nce,
                              mesh=nce_mesh)

    def loss_fn(t_params, s_params, t_bs, s_bs, batch: Batch, rng, bank,
                sbank):
        s_rng, nce_rng1, nce_rng2 = jax.random.split(rng, 3)
        valid = _valid_of(batch)
        im = dewire(batch["im"])
        (s_out, s_feat), s_mut = student_model.apply(
            {"params": s_params, "batch_stats": s_bs},
            im, train=True, mask=valid,
            rngs={"dropout": s_rng}, mutable=["batch_stats"],
        )
        (t_out, t_feat), t_mut = teacher_model.apply(
            {"params": t_params, "batch_stats": t_bs},
            im, _shape_of(batch, sbank), train=True, mask=valid,
            mutable=["batch_stats"],
        )
        t_out = _f32(t_out)
        s_feat = s_feat.astype(jnp.float32)
        t_feat = t_feat.astype(jnp.float32)

        teacher_loss = pose_loss(t_out, batch["label"], bin_size, valid=valid)
        if use_memory_bank:
            from pose3d_tpu.losses import info_nce_memory

            # same key-side dropout regime as the non-bank branch, so the
            # bank A/B isolates the queue extension (ADVICE r2)
            nce_s2t = info_nce_memory(s_feat, t_feat, bank, tau, valid=valid,
                                      dropout_rng=nce_rng1)
            nce_t2s = info_nce_memory(t_feat, s_feat, bank, tau, valid=valid,
                                      dropout_rng=nce_rng2)
        else:
            nce_s2t = _sym_nce(s_feat, t_feat, batch["label"], nce_rng1, valid)
            nce_t2s = _sym_nce(t_feat, s_feat, batch["label"], nce_rng2, valid)
        loss = teacher_loss + nce_weight * (0.5 * nce_s2t + 0.5 * nce_t2s)
        return loss, (t_out, t_mut["batch_stats"], s_mut["batch_stats"],
                      teacher_loss, t_feat)

    def raw_step(sbank, teacher_state, student_state, batch: Batch, bank=None):
        rng, new_rng = jax.random.split(student_state.rng)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (t_out, t_bs, s_bs, t_loss, t_feat)), (t_grads, s_grads) = grad_fn(
            teacher_state.params, student_state.params,
            teacher_state.batch_stats, student_state.batch_stats, batch, rng,
            bank, sbank,
        )
        teacher_state = teacher_state.apply_gradients(t_grads, new_batch_stats=t_bs)
        student_state = student_state.apply_gradients(
            s_grads, new_batch_stats=s_bs, new_rng=new_rng
        )
        _, acc = _train_metrics(t_out, batch["label"], bin_size, _valid_of(batch))
        metrics = {"loss": loss, "teacher_loss": t_loss, "acc_rot": acc}
        if use_memory_bank:
            from pose3d_tpu.losses import enqueue

            # padded rows are masked out of the enqueue (compacted scatter,
            # losses/memory_bank.py) — the queue holds only real features
            bank = enqueue(bank, t_feat, valid=_valid_of(batch))
            return teacher_state, student_state, metrics, bank
        return teacher_state, student_state, metrics

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)


# --------------------------------------------------------------------------
# Stage 2: response KD from the stage-1 teacher — base_class.py:571-688
# --------------------------------------------------------------------------
def make_stage2_step(
    student_model,
    teacher_model,
    bin_size: int = 15,
    temperature: float = 1.0,
    device_views: bool = False,
    int8_teacher: bool = False,
    with_shape_bank: bool = False,
) -> Callable:
    # int8_teacher: frozen vanilla teacher's resnet18 through the int8
    # serving path (see make_kd_crd_step — same contract: teacher_vars
    # becomes {"variables": tv, "q8": quantize_teacher_vanilla(tv, ...)})
    if int8_teacher:
        from pose3d_tpu.serving.quant_teacher import make_vanilla_int8_kd_fwd

        int8_fwd = make_vanilla_int8_kd_fwd(teacher_model)

    def loss_fn(params, batch_stats, teacher_vars, batch: Batch, rng, bank):
        valid = _valid_of(batch)
        valid3 = None if valid is None else jnp.concatenate([valid] * 3, axis=0)
        if device_views:
            from pose3d_tpu.ops.augment import (device_augment as _aug,
                                                synthesize_views)

            rng, aug_rng = jax.random.split(rng)
            im = _aug(synthesize_views(dewire(batch["im"]), batch["rot_sign"]),
                      aug_rng)
        else:
            im = dewire(jnp.concatenate(
                [batch["im"], batch["im_flip"], batch["im_rot"]], axis=0))
        label = jnp.concatenate(
            [batch["label"], batch["label_flip"], batch["label_rot"]], axis=0
        )
        (s_out, _), mutated = student_model.apply(
            {"params": params, "batch_stats": batch_stats},
            im, train=True, mask=valid3,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        # view_tile=3: see make_kd_crd_step — shape encoder runs once
        shape = _shape_of(batch, bank)
        if int8_teacher:
            t_out = int8_fwd(teacher_vars["q8"], teacher_vars["variables"],
                             im, shape, view_tile=3)
        else:
            t_out, _ = teacher_model.apply(teacher_vars, im, shape,
                                           train=False, view_tile=3)
        t_out = jax.tree.map(jax.lax.stop_gradient, t_out)

        s_out, t_out = _f32(s_out), _f32(t_out)
        gt = pose_loss(s_out, label, bin_size, valid=valid3)
        loss = kd_loss(s_out, t_out, gt, temperature=temperature, valid=valid3)
        return loss, (s_out, label, valid3, mutated["batch_stats"], gt)

    def raw_step(bank, student_state, teacher_vars, batch: Batch):
        rng, new_rng = jax.random.split(student_state.rng)
        (loss, (s_out, label, valid3, new_bs, gt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(student_state.params, student_state.batch_stats, teacher_vars, batch,
          rng, bank)
        student_state = student_state.apply_gradients(
            grads, new_batch_stats=new_bs, new_rng=new_rng
        )
        _, acc = _train_metrics(s_out, label, bin_size, valid3)
        return student_state, {"loss": loss, "gt_loss": gt, "acc_rot": acc}

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)


# --------------------------------------------------------------------------
# Evaluation step — evaluation.py:11-117
# --------------------------------------------------------------------------
def make_eval_step(model, kind: str, bin_size: int = 15,
                   with_shape_bank: bool = False) -> Callable:
    """kind: 'student' (im) | 'teacher' (im, shape; 3-tuple out) |
    'vanilla' (im, shape; 2-tuple out).

    Returns step(variables, batch) -> {'pred': (N,3), 'loss': scalar,
    'nce_loss': scalar or 0}. Uses the train/val decoder
    (bin + tanh(d)/2 + 0.5) * bin_size.
    with_shape_bank: the step takes the device-resident bank as its FIRST
    argument (--device_shapes eval; see _shape_of for why it must be an
    argument) and resolves the shape from the batch's bank-reference keys.
    """

    def raw_step(bank, variables, batch: Batch):
        if kind == "student":
            out = model.apply(variables, batch["im"], train=False)
            outputs, fused, img_proj = out[0], None, None
        elif kind == "teacher":
            outputs, fused, img_proj = model.apply(
                variables, batch["im"], _shape_of(batch, bank),
                train=False
            )
        elif kind == "vanilla":
            outputs, _ = model.apply(variables, batch["im"],
                                     _shape_of(batch, bank), train=False)
            fused = img_proj = None
        else:
            raise ValueError(kind)

        outputs = _f32(outputs)
        per_sample = pose_loss_per_sample(outputs, batch["label"], bin_size)
        preds = geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]),
                                            bin_size)
        metrics = {"pred": preds, "loss": jnp.mean(per_sample),
                   "per_sample_loss": per_sample}
        if fused is not None:
            # val_new's contrastive val loss (evaluation.py:86); the reference
            # applies teacher-dropout even at val — reproduced with a fixed
            # key. Padded tail rows are masked out of the negative pool so
            # they cannot contaminate any real row's denominator; the caller
            # drops them from the mean (per-sample, like the pose loss).
            metrics["per_sample_nce"] = info_nce_kd_per_sample(
                img_proj.astype(jnp.float32), fused.astype(jnp.float32), 0.1,
                dropout_rng=jax.random.key(0), valid=batch.get("valid"),
            )
        return metrics

    if with_shape_bank:
        return raw_step
    return partial(raw_step, None)
