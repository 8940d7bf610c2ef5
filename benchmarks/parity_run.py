"""Cross-framework accuracy-parity harness (round-2 VERDICT item #1).

Trains the REFERENCE torch `PoseEstimator_Vanilla` (imported read-only from
/root/reference) and the pose3d_tpu `PoseEstimatorVanilla` on the SAME
synthetic fixture, from the SAME initialization (torch init -> .pth ->
flax importer), on the SAME batch stream (the deterministic pose3d_tpu
loader feeds both sides), with the SAME optimizer (torch.optim.Adam(wd=5e-4)
vs torch_style_adam) and the SAME 4-term pose loss
(/root/reference/auxiliary/loss.py:7-44, reimplemented in torch below — the
reference module itself calls .cuda() at import time and cannot be imported
on a CUDA-less host, SURVEY.md §2b).

Both sides are evaluated through pose3d_tpu.train.evaluate.evaluate_categories
(the torch model is wrapped as an eval_step), so the Acc@pi/6 / MedErr
reduction code (reference evaluation.py:131-140) is literally shared —
any trajectory difference is model/optimizer numerics, not metric code.

Checks produced:
  * epoch-0 eval parity: identical weights must give identical per-sample
    geodesic errors (the "imported-torch-weights eval == torch eval" claim);
  * per-epoch train-loss and val Acc@pi/6 trajectories + deltas;
  * a JSON report (+ markdown rows for docs/PARITY.md).

Run:  python benchmarks/parity_run.py --epochs 6 --out /tmp/parity.json
(CPU-forced by default: torch is CPU-only here, and CPU-vs-CPU keeps fp
drift to roundoff. ~minutes on one core.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _force_cpu():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------------
# torch side: init scheme + pose loss (reference loss.py semantics) + step
# --------------------------------------------------------------------------

def _torch_kaiming_init(model):
    """Reference KaiMingInit (auxiliary/utils.py:23-36): Conv2d
    kaiming_normal(a=0.2), Linear normal(std=1e-3), zero biases."""
    import torch

    for m in model.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv1d)):
            torch.nn.init.kaiming_normal_(m.weight, a=0.2)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
        elif isinstance(m, torch.nn.Linear):
            torch.nn.init.normal_(m.weight, std=1e-3)
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)


def _torch_pose_loss(outputs, label, bin_size=15):
    """CE on bin labels + SmoothL1 on in-bin deltas (loss.py:7-44)."""
    import torch

    ce = torch.nn.CrossEntropyLoss()
    loss = (ce(outputs[0], (label[:, 0] // bin_size).long())
            + ce(outputs[1], (label[:, 1] // bin_size).long())
            + ce(outputs[2], (label[:, 2] // bin_size).long()))
    target = label.float()
    target_delta = (target % bin_size) / bin_size - 0.5
    gt_bin = (label // bin_size).long()
    deltas = []
    for i, reg in enumerate(outputs[3:6]):
        d = reg.gather(1, gt_bin[:, i:i + 1])[:, 0]
        deltas.append(torch.tanh(d) / 2.0)
    pred_delta = torch.stack(deltas, dim=1)
    loss = loss + torch.nn.functional.smooth_l1_loss(5.0 * pred_delta,
                                                     5.0 * target_delta)
    return loss


def _to_torch(batch):
    import torch

    im = torch.from_numpy(np.ascontiguousarray(
        batch["im"].transpose(0, 3, 1, 2))).float()
    shp = torch.from_numpy(np.ascontiguousarray(
        batch["shape"].transpose(0, 2, 1))).float()
    label = torch.from_numpy(batch["label"].astype(np.int64))
    return im, shp, label


def make_torch_eval_step(tmodel, bin_size=15):
    """Wrap the torch model as an evaluate_categories eval_step so both
    frameworks share the metric/reduction code exactly. Handles both the
    vanilla 2-tuple and the teacher 3-tuple output arities."""
    import torch

    import jax.numpy as jnp
    from pose3d_tpu import geometry
    from pose3d_tpu.losses import pose_loss_per_sample

    def eval_step(_variables, batch):
        tmodel.eval()
        with torch.no_grad():
            im, shp, _ = _to_torch({k: np.asarray(v) for k, v in batch.items()
                                    if k in ("im", "shape", "label")} |
                                   {"label": np.asarray(batch["label"])})
            out = tmodel(im, shp)[0]
            outs = [jnp.asarray(o.numpy().astype(np.float32)) for o in out]
        preds = geometry.decode_predictions(tuple(outs[:3]), tuple(outs[3:]),
                                            bin_size)
        per = pose_loss_per_sample(outs, jnp.asarray(np.asarray(batch["label"])),
                                   bin_size)
        return {"pred": preds, "loss": jnp.mean(per), "per_sample_loss": per}

    return eval_step


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def run_parity(
    epochs: int = 6,
    n_train_per_cat: int = 24,
    n_val_per_cat: int = 8,
    batch_size: int = 8,
    input_dim: int = 64,
    point_num: int = 64,
    img_feature_dim: int = 64,
    shape_feature_dim: int = 32,
    lr: float = 1e-4,
    seed: int = 46,
    data_root: str | None = None,
    verbose: bool = True,
) -> dict:
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import torch

    from pose3d_tpu.data import synthetic
    from pose3d_tpu.data.datasets import Pascal3D
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models import PoseEstimatorVanilla
    from pose3d_tpu.train import create_train_state, steps, torch_style_adam
    from pose3d_tpu.train.evaluate import evaluate_categories
    from pose3d_tpu.train.torch_import import load_torch_variables

    torch.manual_seed(seed)

    tmp = None
    if data_root is None:
        tmp = tempfile.mkdtemp(prefix="parity_")
        data_root = tmp
    root = os.path.join(data_root, "ObjectNet3D")
    if not os.path.exists(os.path.join(root, "ObjectNet3D.txt")):
        synthetic.make_objectnet3d_fixture(
            root, n_train_per_cat=n_train_per_cat, n_val_per_cat=n_val_per_cat,
            image_size=max(96, input_dim), seed=seed)

    common = dict(shape="PointCloud", shape_dir="pointcloud",
                  input_dim=input_dim, point_num=point_num)
    ds_train = Pascal3D(root, "ObjectNet3D.txt", train=True, **common)
    ds_val = Pascal3D(root, "ObjectNet3D.txt", train=False, random=False, **common)
    cats = ds_val.category_names

    train_loader = DataLoader(ds_train, batch_size, shuffle=True,
                              drop_last=True, num_workers=0, seed=seed)
    val_loader = DataLoader(ds_val, batch_size, shuffle=False, num_workers=0,
                            seed=seed)
    val_batches = list(val_loader)  # fixed val stream shared by both sides

    # ---- reference torch model, our init scheme, exported to the jax side
    sys.path.insert(0, "/root/reference")
    from auxiliary.model import PoseEstimator_Vanilla as TorchVanilla  # type: ignore

    tmodel = TorchVanilla(img_feature_dim=img_feature_dim,
                          shape_feature_dim=shape_feature_dim,
                          shape="PointCloud")
    _torch_kaiming_init(tmodel)
    pth = os.path.join(data_root, "parity_init.pth")
    torch.save({"model": tmodel.state_dict()}, pth)

    jmodel = PoseEstimatorVanilla(shape="PointCloud",
                                  img_feature_dim=img_feature_dim,
                                  shape_feature_dim=shape_feature_dim)
    im_ex = jnp.zeros((1, input_dim, input_dim, 3))
    pc_ex = jnp.zeros((1, point_num, 3))
    state = create_train_state(jmodel, (im_ex, pc_ex), jax.random.key(seed),
                               torch_style_adam(lr, 5e-4))
    variables = load_torch_variables(pth, {"params": state.params,
                                           "batch_stats": state.batch_stats})
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    topt = torch.optim.Adam(tmodel.parameters(), lr=lr, weight_decay=5e-4)
    jstep = jax.jit(steps.make_vanilla_train_step(jmodel, has_shape=True))
    jeval = jax.jit(steps.make_eval_step(jmodel, "vanilla"))
    teval = make_torch_eval_step(tmodel)

    def eval_both():
        jvars = {"params": state.params, "batch_stats": state.batch_stats}
        rj = evaluate_categories(jeval, jvars, iter(val_batches), cats)
        rt = evaluate_categories(teval, None, iter(val_batches), cats)
        return rt, rj

    report = {"config": dict(epochs=epochs, batch_size=batch_size,
                             n_train=len(ds_train), n_val=len(ds_val),
                             input_dim=input_dim, lr=lr, seed=seed),
              "epochs": []}

    # ---- epoch-0: identical weights => identical eval (the exactness claim)
    rt0, rj0 = eval_both()
    err_gap0 = float(np.max(np.abs(rt0.errors - rj0.errors)))
    report["epoch0"] = {
        "torch_acc": rt0.sample_acc, "jax_acc": rj0.sample_acc,
        "torch_med": rt0.sample_med, "jax_med": rj0.sample_med,
        "max_err_gap_deg": err_gap0,
    }
    if verbose:
        print(f"epoch 0 (identical init): torch acc {rt0.sample_acc:.2f} "
              f"jax acc {rj0.sample_acc:.2f}  max per-sample err gap "
              f"{err_gap0:.2e} deg")

    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        batches = list(train_loader)

        tmodel.train()
        tlosses = []
        for b in batches:
            im, shp, label = _to_torch(b)
            out, _ = tmodel(im, shp)
            loss = _torch_pose_loss(out, label)
            topt.zero_grad()
            loss.backward()
            topt.step()
            tlosses.append(float(loss.detach()))

        jlosses = []
        for b in batches:
            jb = {"im": jnp.asarray(b["im"]), "shape": jnp.asarray(b["shape"]),
                  "label": jnp.asarray(b["label"])}
            state, metrics = jstep(state, jb)
            jlosses.append(float(metrics["loss"]))

        rt, rj = eval_both()
        row = {
            "epoch": epoch,
            "torch_train_loss": float(np.mean(tlosses)),
            "jax_train_loss": float(np.mean(jlosses)),
            "torch_val_acc": rt.sample_acc, "jax_val_acc": rj.sample_acc,
            "torch_val_med": rt.sample_med, "jax_val_med": rj.sample_med,
        }
        row["train_loss_rel_gap"] = (
            abs(row["torch_train_loss"] - row["jax_train_loss"])
            / max(abs(row["torch_train_loss"]), 1e-9))
        row["val_acc_gap"] = abs(row["torch_val_acc"] - row["jax_val_acc"])
        report["epochs"].append(row)
        if verbose:
            print(f"epoch {epoch}: train loss torch {row['torch_train_loss']:.4f} "
                  f"jax {row['jax_train_loss']:.4f} (rel gap "
                  f"{row['train_loss_rel_gap']:.3%}) | val acc torch "
                  f"{row['torch_val_acc']:.2f} jax {row['jax_val_acc']:.2f}")

    last = report["epochs"][-1]
    report["summary"] = {
        "epoch0_max_err_gap_deg": err_gap0,
        "final_train_loss_rel_gap": last["train_loss_rel_gap"],
        "final_val_acc_gap": last["val_acc_gap"],
        "max_val_acc_gap": max(r["val_acc_gap"] for r in report["epochs"]),
    }
    return report


# --------------------------------------------------------------------------
# KD --crd regime (the headline distillation path)
# --------------------------------------------------------------------------

def _torch_t2_kl(s, t, temperature=1.0):
    """TemperatureScaledKLDivLoss (vanilla_kd.py:8-30): T^2 * batchmean
    KL(softmax(t/T) || softmax(s/T))."""
    import torch

    log_p = torch.nn.functional.log_softmax(s / temperature, dim=-1)
    q = torch.nn.functional.softmax(t / temperature, dim=-1)
    return (temperature ** 2) * torch.nn.functional.kl_div(
        log_p, q, reduction="batchmean")


def make_torch_student_eval_step(tmodel, bin_size=15):
    import torch

    import jax.numpy as jnp
    from pose3d_tpu import geometry
    from pose3d_tpu.losses import pose_loss_per_sample

    def eval_step(_variables, batch):
        tmodel.eval()
        with torch.no_grad():
            im = torch.from_numpy(np.ascontiguousarray(
                np.asarray(batch["im"]).transpose(0, 3, 1, 2))).float()
            out, _ = tmodel(im)
            outs = [jnp.asarray(o.numpy().astype(np.float32)) for o in out]
        preds = geometry.decode_predictions(tuple(outs[:3]), tuple(outs[3:]),
                                            bin_size)
        per = pose_loss_per_sample(outs, jnp.asarray(np.asarray(batch["label"])),
                                   bin_size)
        return {"pred": preds, "loss": jnp.mean(per), "per_sample_loss": per}

    return eval_step


def run_parity_kd(
    epochs: int = 4,
    n_train_per_cat: int = 16,
    n_val_per_cat: int = 6,
    batch_size: int = 6,
    input_dim: int = 64,
    point_num: int = 64,
    img_feature_dim: int = 128,
    shape_feature_dim: int = 64,
    lr: float = 1e-4,
    seed: int = 46,
    data_root: str | None = None,
    verbose: bool = True,
) -> dict:
    """Trajectory parity on the KD --crd regime (base_class.py:303-449 +
    calculate_kd_loss_new, vanilla_kd.py:143-164): reference torch
    BaselineEstimator student distilled from a frozen reference PoseEstimator
    teacher vs the pose3d_tpu pair, identical init (torch export -> flax
    import for BOTH models), identical 3-view batch stream, identical
    optimizer. Dropout is disabled on both sides (the one op whose rng
    streams cannot be matched across frameworks; VGG11 has no BN, so the
    student is then fully deterministic)."""
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import torch

    from pose3d_tpu.data import synthetic
    from pose3d_tpu.data.datasets import Pascal3DContrast
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, steps, torch_style_adam
    from pose3d_tpu.train.evaluate import evaluate_categories
    from pose3d_tpu.train.torch_import import load_torch_variables

    torch.manual_seed(seed)
    # real-data pre-wiring: pass --data_root pointing at a real ObjectNet3D
    # layout (docs/DATA.md) and the run uses it unchanged; otherwise a
    # synthetic fixture is generated
    if data_root is None:
        data_root = tempfile.mkdtemp(prefix="parity_kd_")
    root = os.path.join(data_root, "ObjectNet3D")
    if not os.path.exists(os.path.join(root, "ObjectNet3D.txt")):
        synthetic.make_objectnet3d_fixture(
            root, n_train_per_cat=n_train_per_cat, n_val_per_cat=n_val_per_cat,
            image_size=max(96, input_dim), seed=seed)
    tmp = tempfile.mkdtemp(prefix="parity_kd_ckpt_")

    common = dict(shape="PointCloud", shape_dir="pointcloud",
                  input_dim=input_dim, point_num=point_num)
    ds_train = Pascal3DContrast(root, "ObjectNet3D.txt", train=True,
                                seed=seed, **common)
    ds_val = Pascal3DContrast(root, "ObjectNet3D.txt", train=False, **common)
    cats = ds_val.category_names
    train_loader = DataLoader(ds_train, batch_size, shuffle=True,
                              drop_last=True, num_workers=0, seed=seed)
    val_batches = list(DataLoader(ds_val, batch_size, shuffle=False,
                                  num_workers=0))

    sys.path.insert(0, "/root/reference")
    from auxiliary.model import BaselineEstimator as TorchStudent  # type: ignore
    from auxiliary.model import PoseEstimator as TorchTeacher  # type: ignore

    t_student = TorchStudent(img_feature_dim=img_feature_dim)
    t_teacher = TorchTeacher(img_feature_dim=img_feature_dim,
                             shape_feature_dim=shape_feature_dim,
                             azi_classes=24, ele_classes=12, inp_classes=24,
                             shape="PointCloud")
    _torch_kaiming_init(t_student)
    _torch_kaiming_init(t_teacher)
    for m in list(t_student.modules()) + list(t_teacher.modules()):
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    s_pth = os.path.join(tmp, "student.pth")
    te_pth = os.path.join(tmp, "teacher.pth")
    torch.save({"model": t_student.state_dict()}, s_pth)
    torch.save({"model": t_teacher.state_dict()}, te_pth)

    j_student = BaselineEstimator(img_feature_dim=img_feature_dim,
                                  dropout_rate=0.0)
    j_teacher = PoseEstimator(shape="PointCloud",
                              img_feature_dim=img_feature_dim,
                              shape_feature_dim=shape_feature_dim)
    im_ex = jnp.zeros((1, input_dim, input_dim, 3))
    pc_ex = jnp.zeros((1, point_num, 3))
    state = create_train_state(j_student, (im_ex,), jax.random.key(seed),
                               torch_style_adam(lr, 5e-4))
    sv = load_torch_variables(s_pth, {"params": state.params,
                                      "batch_stats": state.batch_stats})
    state = state.replace(params=sv["params"], batch_stats=sv["batch_stats"])
    tv0 = j_teacher.init(jax.random.key(seed + 1), im_ex, pc_ex, train=False)
    teacher_vars = load_torch_variables(
        te_pth, {"params": tv0["params"], "batch_stats": tv0["batch_stats"]})

    topt = torch.optim.Adam(t_student.parameters(), lr=lr, weight_decay=5e-4)
    jstep = jax.jit(steps.make_kd_crd_step(j_student, j_teacher))
    jeval = jax.jit(steps.make_eval_step(j_student, "student"))
    teval = make_torch_student_eval_step(t_student)

    def eval_both():
        jvars = {"params": state.params, "batch_stats": state.batch_stats}
        rj = evaluate_categories(jeval, jvars, iter(val_batches), cats)
        rt = evaluate_categories(teval, None, iter(val_batches), cats)
        return rt, rj

    rt0, rj0 = eval_both()
    err_gap0 = float(np.max(np.abs(rt0.errors - rj0.errors)))
    report = {"regime": "kd_crd", "epoch0": {
        "torch_acc": rt0.sample_acc, "jax_acc": rj0.sample_acc,
        "max_err_gap_deg": err_gap0}, "epochs": []}
    if verbose:
        print(f"[kd] epoch 0 (identical init): torch acc {rt0.sample_acc:.2f} "
              f"jax acc {rj0.sample_acc:.2f}  max per-sample err gap "
              f"{err_gap0:.2e} deg")

    keys = ("im", "shape", "label", "im_flip", "label_flip", "im_rot",
            "label_rot")
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        batches = list(train_loader)

        t_student.train()
        t_teacher.eval()
        tlosses = []
        for b in batches:
            im, shp, label = _to_torch(b)
            im_f = torch.from_numpy(np.ascontiguousarray(
                b["im_flip"].transpose(0, 3, 1, 2))).float()
            im_r = torch.from_numpy(np.ascontiguousarray(
                b["im_rot"].transpose(0, 3, 1, 2))).float()
            lab_f = torch.from_numpy(b["label_flip"].astype(np.int64))
            lab_r = torch.from_numpy(b["label_rot"].astype(np.int64))
            im3 = torch.cat((im, im_f, im_r), 0)
            lab3 = torch.cat((label, lab_f, lab_r), 0)
            shp3 = torch.cat((shp, shp, shp), 0)
            out, s_feat = t_student(im3)
            with torch.no_grad():
                t_out, _, t_feat = t_teacher(im3, shp3)
            gt = _torch_pose_loss(out, lab3)
            kl = sum(_torch_t2_kl(out[i], t_out[i].detach()) for i in range(6))
            feat_kl = _torch_t2_kl(s_feat, t_feat.detach())
            loss = 0.25 * gt + 0.75 * kl + 0.75 * feat_kl
            topt.zero_grad()
            loss.backward()
            topt.step()
            tlosses.append(float(loss.detach()))

        jlosses = []
        for b in batches:
            jb = {k: jnp.asarray(b[k]) for k in keys}
            state, metrics = jstep(state, teacher_vars, jb)
            jlosses.append(float(metrics["loss"]))

        rt, rj = eval_both()
        row = {"epoch": epoch,
               "torch_train_loss": float(np.mean(tlosses)),
               "jax_train_loss": float(np.mean(jlosses)),
               "torch_val_acc": rt.sample_acc, "jax_val_acc": rj.sample_acc}
        row["train_loss_rel_gap"] = (
            abs(row["torch_train_loss"] - row["jax_train_loss"])
            / max(abs(row["torch_train_loss"]), 1e-9))
        row["val_acc_gap"] = abs(row["torch_val_acc"] - row["jax_val_acc"])
        report["epochs"].append(row)
        if verbose:
            print(f"[kd] epoch {epoch}: train loss torch "
                  f"{row['torch_train_loss']:.4f} jax "
                  f"{row['jax_train_loss']:.4f} (rel gap "
                  f"{row['train_loss_rel_gap']:.3%}) | val acc torch "
                  f"{row['torch_val_acc']:.2f} jax {row['jax_val_acc']:.2f}")

    last = report["epochs"][-1]
    report["summary"] = {
        "epoch0_max_err_gap_deg": err_gap0,
        "final_train_loss_rel_gap": last["train_loss_rel_gap"],
        "final_val_acc_gap": last["val_acc_gap"],
        "max_val_acc_gap": max(r["val_acc_gap"] for r in report["epochs"]),
    }
    return report


# --------------------------------------------------------------------------
# Teacher regime (flagship contrastive teacher loop, training.py:50-59)
# --------------------------------------------------------------------------

def _torch_info_nce_kd(feat_ori, feat_pos, tau=0.1):
    """Reference infoNCE_KD (model_utils.py:263-285) minus the p=0.3 teacher
    dropout (disabled on both sides for determinism — the reference module
    itself is unimportable here: model_utils.py:67/118 call .cuda() at import
    time on a CUDA-less host)."""
    import torch

    feat_ori = torch.nn.functional.normalize(feat_ori, dim=-1)
    feat_pos = torch.nn.functional.normalize(feat_pos, dim=-1)
    l_pos = torch.exp(torch.sum(feat_ori * feat_pos, -1, keepdim=True) / tau)
    l_neg = torch.exp(feat_ori @ feat_pos.t() / tau)
    logits = torch.cat([l_pos, l_neg], dim=1)
    return (-torch.log(logits[:, 0] / torch.sum(logits, -1))).mean()


def run_parity_teacher(
    epochs: int = 4,
    n_train_per_cat: int = 16,
    n_val_per_cat: int = 6,
    batch_size: int = 8,
    input_dim: int = 64,
    point_num: int = 64,
    img_feature_dim: int = 128,
    shape_feature_dim: int = 64,
    lr: float = 1e-4,
    seed: int = 46,
    data_root: str | None = None,
    verbose: bool = True,
) -> dict:
    """Trajectory parity on the flagship contrastive-teacher regime
    (training.py:26-88: 4-term pose loss + 0.5*infoNCE tau=0.1): reference
    torch PoseEstimator vs pose3d_tpu PoseEstimator, identical init (torch
    export -> flax import), identical batch stream, identical optimizer.
    NCE teacher-dropout is disabled on both sides (the one rng stream that
    cannot be matched cross-framework); neither model has any other dropout,
    so both trajectories are deterministic. This is the path where global-
    batch NCE and sync-BN-under-DP make the rebuild's dynamics most different
    from torch per-GPU BN — f32 CPU vs f32 CPU isolates the math."""
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import torch

    from pose3d_tpu.data import synthetic
    from pose3d_tpu.data.datasets import Pascal3D
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models import PoseEstimator
    from pose3d_tpu.train import create_train_state, steps, torch_style_adam
    from pose3d_tpu.train.evaluate import evaluate_categories
    from pose3d_tpu.train.torch_import import load_torch_variables

    torch.manual_seed(seed)
    # real-data pre-wiring: see run_parity_kd
    if data_root is None:
        data_root = tempfile.mkdtemp(prefix="parity_teacher_")
    root = os.path.join(data_root, "ObjectNet3D")
    if not os.path.exists(os.path.join(root, "ObjectNet3D.txt")):
        synthetic.make_objectnet3d_fixture(
            root, n_train_per_cat=n_train_per_cat, n_val_per_cat=n_val_per_cat,
            image_size=max(96, input_dim), seed=seed)
    tmp = tempfile.mkdtemp(prefix="parity_teacher_ckpt_")

    common = dict(shape="PointCloud", shape_dir="pointcloud",
                  input_dim=input_dim, point_num=point_num)
    ds_train = Pascal3D(root, "ObjectNet3D.txt", train=True, **common)
    ds_val = Pascal3D(root, "ObjectNet3D.txt", train=False, random=False, **common)
    cats = ds_val.category_names
    train_loader = DataLoader(ds_train, batch_size, shuffle=True,
                              drop_last=True, num_workers=0, seed=seed)
    val_batches = list(DataLoader(ds_val, batch_size, shuffle=False,
                                  num_workers=0))

    sys.path.insert(0, "/root/reference")
    from auxiliary.model import PoseEstimator as TorchTeacher  # type: ignore

    tmodel = TorchTeacher(img_feature_dim=img_feature_dim,
                          shape_feature_dim=shape_feature_dim,
                          azi_classes=24, ele_classes=12, inp_classes=24,
                          shape="PointCloud")
    _torch_kaiming_init(tmodel)
    pth = os.path.join(tmp, "teacher_init.pth")
    torch.save({"model": tmodel.state_dict()}, pth)

    jmodel = PoseEstimator(shape="PointCloud", img_feature_dim=img_feature_dim,
                           shape_feature_dim=shape_feature_dim)
    im_ex = jnp.zeros((1, input_dim, input_dim, 3))
    pc_ex = jnp.zeros((1, point_num, 3))
    state = create_train_state(jmodel, (im_ex, pc_ex), jax.random.key(seed),
                               torch_style_adam(lr, 5e-4))
    variables = load_torch_variables(pth, {"params": state.params,
                                           "batch_stats": state.batch_stats})
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    topt = torch.optim.Adam(tmodel.parameters(), lr=lr, weight_decay=5e-4)
    # nce_dropout=0.0: deterministic NCE on both sides
    jstep = jax.jit(steps.make_teacher_train_step(jmodel, nce_dropout=0.0))
    jeval = jax.jit(steps.make_eval_step(jmodel, "teacher"))
    teval = make_torch_eval_step(tmodel)

    def eval_both():
        jvars = {"params": state.params, "batch_stats": state.batch_stats}
        rj = evaluate_categories(jeval, jvars, iter(val_batches), cats)
        rt = evaluate_categories(teval, None, iter(val_batches), cats)
        return rt, rj

    rt0, rj0 = eval_both()
    err_gap0 = float(np.max(np.abs(rt0.errors - rj0.errors)))
    report = {"regime": "teacher", "epoch0": {
        "torch_acc": rt0.sample_acc, "jax_acc": rj0.sample_acc,
        "max_err_gap_deg": err_gap0}, "epochs": []}
    if verbose:
        print(f"[teacher] epoch 0 (identical init): torch acc "
              f"{rt0.sample_acc:.2f} jax acc {rj0.sample_acc:.2f}  max "
              f"per-sample err gap {err_gap0:.2e} deg")

    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        batches = list(train_loader)

        tmodel.train()
        tlosses, tnces = [], []
        for b in batches:
            im, shp, label = _to_torch(b)
            out, fused, img_feat = tmodel(im, shp)
            gt = _torch_pose_loss(out, label)
            nce = _torch_info_nce_kd(img_feat, fused, tau=0.1)
            loss = gt + 0.5 * nce  # training.py:56-58
            topt.zero_grad()
            loss.backward()
            topt.step()
            tlosses.append(float(loss.detach()))
            tnces.append(float(nce.detach()))

        jlosses, jnces = [], []
        for b in batches:
            jb = {"im": jnp.asarray(b["im"]), "shape": jnp.asarray(b["shape"]),
                  "label": jnp.asarray(b["label"])}
            state, metrics = jstep(state, jb)
            jlosses.append(float(metrics["loss"]))
            jnces.append(float(metrics["nce_loss"]))

        rt, rj = eval_both()
        row = {"epoch": epoch,
               "torch_train_loss": float(np.mean(tlosses)),
               "jax_train_loss": float(np.mean(jlosses)),
               "torch_nce": float(np.mean(tnces)),
               "jax_nce": float(np.mean(jnces)),
               "torch_val_acc": rt.sample_acc, "jax_val_acc": rj.sample_acc}
        row["train_loss_rel_gap"] = (
            abs(row["torch_train_loss"] - row["jax_train_loss"])
            / max(abs(row["torch_train_loss"]), 1e-9))
        row["nce_rel_gap"] = (abs(row["torch_nce"] - row["jax_nce"])
                              / max(abs(row["torch_nce"]), 1e-9))
        row["val_acc_gap"] = abs(row["torch_val_acc"] - row["jax_val_acc"])
        report["epochs"].append(row)
        if verbose:
            print(f"[teacher] epoch {epoch}: train loss torch "
                  f"{row['torch_train_loss']:.4f} jax "
                  f"{row['jax_train_loss']:.4f} (rel gap "
                  f"{row['train_loss_rel_gap']:.3%}) | nce rel gap "
                  f"{row['nce_rel_gap']:.3%} | val acc torch "
                  f"{row['torch_val_acc']:.2f} jax {row['jax_val_acc']:.2f}")

    last = report["epochs"][-1]
    report["summary"] = {
        "epoch0_max_err_gap_deg": err_gap0,
        "final_train_loss_rel_gap": last["train_loss_rel_gap"],
        "final_nce_rel_gap": last["nce_rel_gap"],
        "final_val_acc_gap": last["val_acc_gap"],
        "max_val_acc_gap": max(r["val_acc_gap"] for r in report["epochs"]),
    }
    return report


# --------------------------------------------------------------------------
# bf16-vs-f32 trajectory drift (production-dtype dynamics evidence)
# --------------------------------------------------------------------------

def run_bf16_drift(
    epochs: int = 3,
    n_train_per_cat: int = 16,
    n_val_per_cat: int = 6,
    batch_size: int = 6,
    input_dim: int = 64,
    point_num: int = 64,
    img_feature_dim: int = 128,
    shape_feature_dim: int = 64,
    lr: float = 1e-4,
    seed: int = 46,
    platform: str | None = "cpu",
    verbose: bool = True,
) -> dict:
    """Quantifies the ONE numerics axis where the production TPU path differs
    from every cross-framework parity run above: bfloat16 compute
    (models dtype=bf16, params/losses f32 — the --bf16 production config) vs
    full f32, pose3d_tpu vs itself on the KD --crd regime. Identical init,
    identical batch stream, identical rng streams — the per-epoch gaps below
    are PURE dtype drift. Runs on CPU by default (platform=None keeps the
    default device, e.g. the TPU chip)."""
    if platform == "cpu":
        _force_cpu()
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.data import synthetic
    from pose3d_tpu.data.datasets import Pascal3DContrast
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, steps, torch_style_adam
    from pose3d_tpu.train.evaluate import evaluate_categories

    tmp = tempfile.mkdtemp(prefix="bf16_drift_")
    root = os.path.join(tmp, "ObjectNet3D")
    synthetic.make_objectnet3d_fixture(
        root, n_train_per_cat=n_train_per_cat, n_val_per_cat=n_val_per_cat,
        image_size=max(96, input_dim), seed=seed)

    common = dict(shape="PointCloud", shape_dir="pointcloud",
                  input_dim=input_dim, point_num=point_num)
    ds_train = Pascal3DContrast(root, "ObjectNet3D.txt", train=True,
                                seed=seed, **common)
    ds_val = Pascal3DContrast(root, "ObjectNet3D.txt", train=False, **common)
    cats = ds_val.category_names
    train_loader = DataLoader(ds_train, batch_size, shuffle=True,
                              drop_last=True, num_workers=0, seed=seed)
    val_batches = list(DataLoader(ds_val, batch_size, shuffle=False,
                                  num_workers=0))

    im_ex = jnp.zeros((1, input_dim, input_dim, 3))
    pc_ex = jnp.zeros((1, point_num, 3))

    sides = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        student = BaselineEstimator(img_feature_dim=img_feature_dim, dtype=dtype)
        teacher = PoseEstimator(shape="PointCloud",
                                img_feature_dim=img_feature_dim,
                                shape_feature_dim=shape_feature_dim, dtype=dtype)
        # params are f32 in BOTH configs (param_dtype=f32); identical keys
        # give bit-identical initial params — dtype only changes compute
        state = create_train_state(student, (im_ex,), jax.random.key(seed),
                                   torch_style_adam(lr, 5e-4))
        tv = teacher.init(jax.random.key(seed + 1), im_ex, pc_ex, train=False)
        sides[name] = dict(
            state=state, tv=tv,
            step=jax.jit(steps.make_kd_crd_step(student, teacher)),
            eval_step=jax.jit(steps.make_eval_step(student, "student")))

    keys = ("im", "shape", "label", "im_flip", "label_flip", "im_rot",
            "label_rot")
    report = {"regime": "bf16_drift", "platform": platform or "default",
              "epochs": []}
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        batches = list(train_loader)
        losses = {"f32": [], "bf16": []}
        for name, side in sides.items():
            for b in batches:
                jb = {k: jnp.asarray(b[k]) for k in keys}
                side["state"], m = side["step"](side["state"], side["tv"], jb)
                losses[name].append(float(m["loss"]))
        accs = {}
        for name, side in sides.items():
            jvars = {"params": side["state"].params,
                     "batch_stats": side["state"].batch_stats}
            accs[name] = evaluate_categories(
                side["eval_step"], jvars, iter(val_batches), cats).sample_acc
        f32l, bf16l = np.mean(losses["f32"]), np.mean(losses["bf16"])
        row = {"epoch": epoch,
               "f32_train_loss": float(f32l), "bf16_train_loss": float(bf16l),
               "train_loss_rel_gap": float(abs(f32l - bf16l) / max(abs(f32l), 1e-9)),
               "f32_val_acc": accs["f32"], "bf16_val_acc": accs["bf16"],
               "val_acc_gap": float(abs(accs["f32"] - accs["bf16"]))}
        report["epochs"].append(row)
        if verbose:
            print(f"[bf16] epoch {epoch}: train loss f32 {f32l:.4f} bf16 "
                  f"{bf16l:.4f} (rel gap {row['train_loss_rel_gap']:.3%}) | "
                  f"val acc f32 {accs['f32']:.2f} bf16 {accs['bf16']:.2f}")

    last = report["epochs"][-1]
    report["summary"] = {
        "final_train_loss_rel_gap": last["train_loss_rel_gap"],
        "max_train_loss_rel_gap": max(r["train_loss_rel_gap"]
                                      for r in report["epochs"]),
        "final_val_acc_gap": last["val_acc_gap"],
        "max_val_acc_gap": max(r["val_acc_gap"] for r in report["epochs"]),
    }
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--n_train_per_cat", type=int, default=24)
    p.add_argument("--n_val_per_cat", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--input_dim", type=int, default=64)
    p.add_argument("--img_feature_dim", type=int, default=64)
    p.add_argument("--shape_feature_dim", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--regime", choices=["vanilla", "kd", "teacher", "bf16_drift"],
                   default="vanilla")
    p.add_argument("--platform", type=str, default="cpu",
                   help="bf16_drift only: 'cpu' forces CPU, 'default' keeps "
                        "the ambient device (e.g. the TPU chip)")
    p.add_argument("--data_root", type=str, default=None,
                   help="real-data pre-wiring: a directory containing a real "
                        "ObjectNet3D layout (docs/DATA.md) — used unchanged; "
                        "omit to generate a synthetic fixture")
    args = p.parse_args(argv)
    sub = dict(epochs=args.epochs, n_train_per_cat=args.n_train_per_cat,
               n_val_per_cat=args.n_val_per_cat, batch_size=args.batch_size,
               input_dim=args.input_dim, lr=args.lr)
    if args.regime == "kd":
        report = run_parity_kd(**sub, data_root=args.data_root)
    elif args.regime == "teacher":
        report = run_parity_teacher(**sub, data_root=args.data_root)
    elif args.regime == "bf16_drift":
        report = run_bf16_drift(
            **sub, platform=None if args.platform == "default" else "cpu")
    else:
        report = run_parity(**sub, img_feature_dim=args.img_feature_dim,
                            shape_feature_dim=args.shape_feature_dim,
                            data_root=args.data_root)
    print(json.dumps(report["summary"], indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {args.out}")
    return report


if __name__ == "__main__":
    main()
