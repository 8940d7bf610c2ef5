"""int8-PTQ vs bf16 student: accuracy agreement on a TRAINED checkpoint.

Loads a trained BaselineEstimator checkpoint (e.g. the verify run's KD
student), calibrates the int8 path on train-set batches, then evaluates BOTH
paths on the val split and reports Acc@pi/6 / Med_Err for each plus
prediction-level agreement (identical decoded bins, mean |angle delta|).
This is the accuracy-evidence companion to `bench.py --metric
student_infer_int8` (which measures throughput on random weights).

Usage:
  python benchmarks/int8_student_eval.py --model <ckpt> --data_root <root> \
      --dataset ObjectNet3D --img_feature_dim 64 --input_dim 64 [--calib_batches 4]

Run on CPU or chip; dataset flags mirror cli/testing.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/pose3d_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(argv=None):
    from pose3d_tpu import geometry
    from pose3d_tpu.cli import common, testing
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.serving import quantize_student, student_int8_infer
    from pose3d_tpu.train import steps as steps_lib
    from pose3d_tpu.train.evaluate import evaluate_categories

    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument("--calib_batches", type=int, default=4)
    opt = parser.parse_args(argv)
    common.normalize_shape(opt)
    opt.shape = None  # student-only path
    if not opt.model:
        raise SystemExit("--model (trained student checkpoint) is required")

    model = common.build_student(opt, img_feature_dim=opt.img_feature_dim)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),
        train=False)
    from pose3d_tpu.cli.trainingKD import _load_ckpt_into
    variables = _load_ckpt_into(variables, opt.model)

    # calibration: train-split crops (the distribution the scales must cover)
    train_ds = testing.build_eval_dataset(opt)  # val transforms, deterministic
    calib_loader = DataLoader(train_ds, opt.batch_size, shuffle=False,
                              num_workers=0)
    calib = []
    for i, b in enumerate(calib_loader):
        if i >= opt.calib_batches:
            break
        calib.append(np.asarray(b["im"]))
    q = quantize_student(variables, calib)

    # bf16 reference pass
    eval_step = jax.jit(steps_lib.make_eval_step(model, "student", opt.bin_size))
    loader = DataLoader(train_ds, opt.batch_size, shuffle=False, num_workers=0)
    ref = evaluate_categories(eval_step, variables, iter(loader),
                              train_ds.category_names)

    # int8 pass: decode predictions the same way the eval step does
    @jax.jit
    def infer_q(qq, im):
        outputs = student_int8_infer(qq, im)
        return geometry.decode_predictions(tuple(outputs[:3]),
                                           tuple(outputs[3:]))

    loader = DataLoader(train_ds, opt.batch_size, shuffle=False, num_workers=0)
    preds_q, labels = [], []
    for b in loader:
        valid = np.asarray(b.get("valid", np.ones(len(b["label"]), bool)))
        preds_q.append(np.asarray(infer_q(q, jnp.asarray(b["im"])))[valid])
        labels.append(np.asarray(b["label"])[valid])
    preds_q = np.concatenate(preds_q)
    labels = np.concatenate(labels).astype(np.float32)

    # identical metric path to evaluate_categories (train/evaluate.py:86)
    errs = np.asarray(geometry.rotation_err(jnp.asarray(preds_q),
                                            jnp.asarray(labels)))
    acc_q = float(np.mean(errs <= 30.0) * 100)
    med_q = float(np.median(errs))

    agree = float(np.mean(np.all(np.isclose(preds_q, ref.predictions,
                                            atol=1e-3), axis=1)) * 100)
    delta = np.abs(preds_q - ref.predictions)
    delta = np.minimum(delta, 360.0 - delta)  # circular
    import json
    print(json.dumps({
        "bf16": {"acc_pi6": round(ref.sample_acc, 2),
                 "med_err": round(ref.sample_med, 2)},
        "int8": {"acc_pi6": round(acc_q, 2), "med_err": round(med_q, 2)},
        "acc_gap_pts": round(abs(acc_q - ref.sample_acc), 3),
        "identical_prediction_pct": round(agree, 2),
        "mean_abs_angle_delta_deg": round(float(delta.mean()), 3),
        "n_samples": int(preds_q.shape[0]),
    }))


if __name__ == "__main__":
    main()
