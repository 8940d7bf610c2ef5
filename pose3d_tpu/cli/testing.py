"""Evaluation CLI — flag-compatible with the reference `testing.py`
(testing.py:15-38 for the flag set; §3.3 of SURVEY.md for the flow).

Differences by design:
  * ONE pass over each dataset with per-category segment reduction instead of
    a dataset rebuild per category (same numbers, ~20x less wall time);
  * the final 'Average for all Samples' line prints Acc and Med in the right
    slots — the reference swaps them (testing.py:149-150, known defect).
Artifacts match: testing_log.txt with per-category lines and
predictions_{cat}.npy dumps.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.cli import common
from pose3d_tpu.data import datasets
from pose3d_tpu.data.loader import DataLoader
from pose3d_tpu.train import steps as steps_lib
from pose3d_tpu.train.evaluate import evaluate_categories


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument("--random_model", action="store_true")
    parser.add_argument("--output_dir", type=str, default=None)
    # int8 PTQ serving eval (pose3d_tpu/serving): student quantizes the VGG
    # trunk; teacher quantizes its resnet trunk(s) — PointCloud: resnet50
    # image encoder; MultiView: resnet50 + per-view resnet18. Calibrated on
    # the first --calib_batches eval batches. The contrastive val loss is
    # not computed on this path (the int8 teacher fwd skips the projector).
    parser.add_argument("--int8", action="store_true",
                        help="evaluate through the int8 PTQ serving path")
    parser.add_argument("--calib_batches", type=int, default=4,
                        help="eval batches used to calibrate --int8 scales")
    parser.add_argument("--device_shapes", action="store_true",
                        help="teacher eval only: resolve shapes from a "
                             "device-resident bank (ops/shape_bank.py) "
                             "instead of per-sample host loads + transfers")
    opt = parser.parse_args(argv)
    common.normalize_shape(opt)
    # reference testing.py defaults (testing.py:21-22)
    return opt


def build_eval_dataset(opt):
    if not hasattr(opt, "random_model"):  # callers sharing common flags only
        opt.random_model = False
    root_dir = os.path.join(opt.data_root, opt.dataset)
    annotation_file = f"{opt.dataset}.txt"
    cats = common.test_cats_for(opt.dataset)
    if opt.dataset in ("Pascal3D", "ObjectNet3D"):
        return datasets.Pascal3DContrast(
            root_dir, annotation_file, train=False, cat_choice=cats,
            keypoint=opt.dataset == "Pascal3D", shape=opt.shape,
            shape_dir=opt.shape_dir, view_num=opt.view_num, tour=opt.tour,
            random_model=opt.random_model, input_dim=opt.input_dim,
            point_num=opt.point_num,
            decode_cache_mb=getattr(opt, "cache_decoded_mb", 0.0))
    if opt.dataset == "LineMod":
        return datasets.Linemod(root_dir, annotation_file, cat_choice=cats,
                                shape=opt.shape, input_dim=opt.input_dim)
    if opt.dataset == "Pix3D":
        return datasets.Pix3DContrast(root_dir, annotation_file, train=False,
                                      cls_choice=cats, input_dim=opt.input_dim)
    raise SystemExit(f"unsupported dataset {opt.dataset}")


def _int8_eval_step(opt, model, kind, variables, dataset, mesh=None):
    """Build an evaluate_categories-compatible eval step that runs the
    quantized serving forward (same metric surface as make_eval_step minus
    the contrastive val loss). The quantized pytree is passed as a jit
    ARGUMENT — closing over it embeds the weights as literals and stalls
    the remote compiler (docs/PERF.md round-3 int8 note)."""
    from pose3d_tpu import geometry
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.losses import pose_loss_per_sample

    dtype = jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32
    calib_loader = DataLoader(dataset, opt.batch_size, shuffle=False,
                              num_workers=0)
    ims, shapes = [], []
    for i, b in enumerate(calib_loader):
        if i >= opt.calib_batches:
            break
        ims.append(np.asarray(b["im"]))
        if kind == "teacher":
            shapes.append(np.asarray(b["shape"]))

    if kind == "student":
        from pose3d_tpu.serving import quantize_student, student_int8_infer

        q = quantize_student(variables, ims)

        def raw(qq, v, batch):
            outputs = [o.astype(jnp.float32)
                       for o in student_int8_infer(qq, batch["im"], dtype)]
            per = pose_loss_per_sample(outputs, batch["label"], opt.bin_size)
            preds = geometry.decode_predictions(
                tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)
            return {"pred": preds, "loss": jnp.mean(per),
                    "per_sample_loss": per}
    else:
        from pose3d_tpu.serving import (make_teacher_int8_infer,
                                        quantize_teacher_mv,
                                        quantize_teacher_resnet)

        if opt.shape == "MultiView":
            q = quantize_teacher_mv(variables, ims, shapes)
        else:
            q = quantize_teacher_resnet(variables, ims)
        infer = make_teacher_int8_infer(model)

        def raw(qq, v, batch):
            outputs = [o.astype(jnp.float32)
                       for o in infer(qq, v, batch["im"], batch["shape"])]
            per = pose_loss_per_sample(outputs, batch["label"], opt.bin_size)
            preds = geometry.decode_predictions(
                tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)
            return {"pred": preds, "loss": jnp.mean(per),
                    "per_sample_loss": per}

    # place the quantized pytree once (replicated over the DP mesh when eval
    # is sharded) — passing host numpy arrays would re-transfer it every batch
    if mesh is not None:
        from pose3d_tpu.parallel import replicate

        q = replicate(q, mesh)
    else:
        q = jax.device_put(q)
    jstep = jax.jit(raw)
    return lambda v, b: jstep(q, v, b)


def main(argv=None):
    opt = parse_args(argv)
    print(opt)

    if opt.shape is None:
        model = common.build_student(opt, img_feature_dim=opt.img_feature_dim)
        kind = "student"
        example = (jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),)
    else:
        model = common.build_teacher(opt)
        kind = "teacher"
        if opt.shape == "PointCloud":
            shape_ex = jnp.zeros((1, opt.point_num, 3))
        else:
            shape_ex = jnp.zeros((1, opt.view_num, opt.input_dim, opt.input_dim, 3))
        example = (jnp.zeros((1, opt.input_dim, opt.input_dim, 3)), shape_ex)

    variables = model.init(jax.random.key(0), *example, train=False)
    if opt.model:
        from pose3d_tpu.cli.trainingKD import _load_ckpt_into

        variables = _load_ckpt_into(variables, opt.model)
    else:
        print("WARNING: no --model given; evaluating random init")

    dataset = build_eval_dataset(opt)
    loader = DataLoader(dataset, opt.batch_size, shuffle=False,
                        num_workers=opt.workers)

    predictions_path = opt.output_dir or os.getcwd()
    os.makedirs(predictions_path, exist_ok=True)
    logname = os.path.join(predictions_path, "testing_log.txt")
    open(logname, "w").write("\n")

    # dataset-scale eval runs data-parallel over all devices, exactly like
    # the trainers: non-dividing tail batches are PADDED (replicated rows
    # marked invalid and dropped from every statistic) rather than shrinking
    # the mesh. Single-device (and the reference's single-GPU testing.py
    # flow, testing.py:40-60) is the mesh=None degenerate case.
    mesh = common.make_dp_mesh(opt)

    shape_bank = None
    if getattr(opt, "device_shapes", False):
        if kind != "teacher":
            raise SystemExit("--device_shapes applies to teacher eval "
                             "(student eval carries no shapes)")
        if opt.int8:
            raise SystemExit("--device_shapes is not combinable with --int8 "
                             "(the int8 calibration consumes host shapes)")
        shape_bank = common.maybe_shape_bank(opt, dataset)

    if opt.int8:
        eval_step = _int8_eval_step(opt, model, kind, variables, dataset, mesh)
    elif shape_bank is not None:
        # the bank is a traced jit ARGUMENT, placed once — closing over it
        # embeds HLO literals and the remote compiler const-folds for
        # minutes per process (docs/PERF.md round 4, same as the int8 note)
        jstep = jax.jit(steps_lib.make_eval_step(model, kind, opt.bin_size,
                                                 with_shape_bank=True))
        if mesh is not None:
            from pose3d_tpu.parallel import replicate

            bank_dev = replicate(shape_bank, mesh)
        else:
            bank_dev = jax.device_put(shape_bank)
        eval_step = lambda v, b: jstep(bank_dev, v, b)
    else:
        eval_step = jax.jit(steps_lib.make_eval_step(model, kind, opt.bin_size))

    if mesh is not None:
        from pose3d_tpu.parallel import replicate

        variables = replicate(variables, mesh)

    from pose3d_tpu.train.trainer import device_batch

    def batches():
        for b in loader:
            host = {k: v for k, v in b.items() if k != "valid"}
            db, hv = device_batch(host, b.get("valid"), mesh)
            yield {**db, "valid": hv}

    result = evaluate_categories(eval_step, variables, batches(),
                                 dataset.category_names)

    with open(logname, "a") as f:
        name_to_id = {n: i for i, n in enumerate(dataset.category_names)}
        for cat in result.per_category_acc:
            n_cat = int(np.sum(result.cat_ids == name_to_id.get(cat, -2)))
            f.write("test accuracy for %d images of catgory %s in datatset %s \n"
                    % (n_cat, cat, opt.dataset))
            f.write("Med_Err is %.2f, and Acc_pi/6 is %.2f \n \n"
                    % (result.per_category_med[cat], result.per_category_acc[cat]))
        f.write("Average for all categories  >>>>  Med_Err is %.2f, and Acc_pi/6 is "
                "%.2f \n" % (result.mean_med, result.mean_acc))
        # NOTE: the reference swaps Acc/Med on this line (testing.py:149-150);
        # we print them correctly.
        f.write("Average for all Samples  >>>>  Med_Err is %.2f, and Acc_pi/6 is "
                "%.2f \n" % (result.sample_med, result.sample_acc))

    # per-category prediction dumps (evaluation.py:128-129)
    if result.predictions is not None:
        for ci, cat in enumerate(dataset.category_names):
            mask = result.cat_ids == ci
            if mask.any():
                np.save(os.path.join(predictions_path, f"predictions_{cat}.npy"),
                        result.predictions[mask])

    print("Average for all categories >>>> Med_Err %.2f, Acc_pi/6 %.2f"
          % (result.mean_med, result.mean_acc))
    print("Average for all samples    >>>> Med_Err %.2f, Acc_pi/6 %.2f"
          % (result.sample_med, result.sample_acc))
    return result


if __name__ == "__main__":
    main()
