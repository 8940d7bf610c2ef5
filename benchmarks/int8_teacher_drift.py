"""Quantify the --int8_teacher approximation on the synthetic fixture.

The int8 frozen teacher inside the KD --crd step (steps.make_kd_crd_step
int8_teacher=True, serving/quant_teacher.py) perturbs the KL targets by the
resnet50 backbone's ~0.5% PTQ error. This harness runs the SAME KD recipe
twice — flax teacher vs int8 teacher, identical seeds/init/batches
(MANUAL_SEED pins both) — and reports the per-epoch train-loss and val-acc
trajectories side by side, the drift analogue of docs/PARITY.md's bf16-vs-f32
table. Reference workload: /root/reference/KD/common/base_class.py:303-449.

Usage: python benchmarks/int8_teacher_drift.py [--epochs 3] [--cpu]
Writes one JSON line per epoch pair + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_epochs(result_dir):
    path = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D",
                        "metrics.jsonl")
    rows = [json.loads(line) for line in open(path)]
    return [r for r in rows if r.get("kind") == "crd_epoch"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--teacher_epochs", type=int, default=2,
                        help="pre-train the fixture teacher first so its "
                             "logits/features are non-degenerate (a random "
                             "init's near-zero logits make the KL terms "
                             "insensitive to the int8 error); 0 = random "
                             "teacher")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (default: whatever jax picks)")
    parser.add_argument("--data_root", type=str, default=None,
                        help="real dataset root; default = synthetic fixture")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pose3d_tpu.cli import trainingKD
    from pose3d_tpu.data import synthetic

    tmp = tempfile.mkdtemp(prefix="int8drift_")
    if args.data_root is None:
        data_root = os.path.join(tmp, "data")
        synthetic.make_objectnet3d_fixture(
            os.path.join(data_root, "ObjectNet3D"),
            n_train_per_cat=4, n_val_per_cat=3)
    else:
        data_root = args.data_root

    common = [
        "--dataset", "ObjectNet3D", "--shape", "PointCloud",
        "--shape_dir", "pointcloud", "--data_root", data_root,
        "--batch_size", "4", "--workers", "0", "--input_dim", "64",
        "--point_num", "64", "--img_feature_dim", "64",
        "--shape_feature_dim", "64",
    ]
    teacher_args = []
    if args.teacher_epochs > 0:
        from pose3d_tpu.cli import training

        tdir = os.path.join(tmp, "teacher")
        training.main(common + ["--result_dir", tdir,
                                "--n_epoch", str(args.teacher_epochs),
                                "--decrease", str(args.teacher_epochs)])
        ckpt = os.path.join(os.getcwd(), tdir, "PointCloud_ObjectNet3D",
                            "ckpt", "checkpoint")
        teacher_args = ["--teacher_model", ckpt]

    base = common + [
        "--student_feature_dim", "64",
        "--crd", "--tau", "0.5", "--decrease", str(args.epochs),
        "--n_epoch", str(args.epochs),
    ] + teacher_args
    runs = {}
    for tag, extra in (("flax", []), ("int8", ["--int8_teacher"])):
        result_dir = os.path.join(tmp, f"result_{tag}")
        trainingKD.main(base + ["--result_dir", result_dir] + extra)
        runs[tag] = _read_epochs(result_dir)

    max_loss_gap = max_acc_gap = 0.0
    for a, b in zip(runs["flax"], runs["int8"]):
        loss_gap = abs(a["train_loss"] - b["train_loss"]) / max(
            abs(a["train_loss"]), 1e-9)
        acc_gap = abs(a["val_acc"] - b["val_acc"])
        max_loss_gap = max(max_loss_gap, loss_gap)
        max_acc_gap = max(max_acc_gap, acc_gap)
        print(json.dumps({
            "epoch": a["epoch"],
            "train_loss_flax": round(a["train_loss"], 6),
            "train_loss_int8": round(b["train_loss"], 6),
            "loss_rel_gap": round(loss_gap, 6),
            "val_acc_flax": round(a["val_acc"], 3),
            "val_acc_int8": round(b["val_acc"], 3),
        }), flush=True)
    print(json.dumps({
        "metric": "int8_teacher_drift", "epochs": args.epochs,
        "max_train_loss_rel_gap": round(max_loss_gap, 6),
        "max_val_acc_gap_pts": round(max_acc_gap, 3),
    }))


if __name__ == "__main__":
    main()
