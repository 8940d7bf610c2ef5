"""Single-image inference CLI.

Parity with /root/reference/inference_imageBased.py (the working one; the
teacher `inference.py` imports a module missing from the reference repo,
SURVEY.md §2 #24): loads a student checkpoint, resize-pads the image to 224,
normalizes, runs the inference decoder (compute_vp_pred: (bin + raw delta) *
bin_size clamped to [0, 360]) and converts back to annotation convention
(ele -= 90, inp -= 180).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pose3d_tpu import geometry
from pose3d_tpu.cli import common
from pose3d_tpu.data import transforms as T


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None,
                        help="trained checkpoint (required unless serving "
                             "from an AOT artifact via --load_aot)")
    parser.add_argument("--img_path", type=str, required=True)
    parser.add_argument("--img_feature_dim", type=int, default=2048)
    parser.add_argument("--bin_size", type=int, default=15)
    parser.add_argument("--input_dim", type=int, default=224)
    parser.add_argument("--bf16", action="store_true")
    # teacher-mode inference (the reference's teacher demo inference.py is
    # broken — imports a missing module; this is the working equivalent)
    parser.add_argument("--ply_path", type=str, default=None,
                        help="point cloud for teacher-mode inference")
    parser.add_argument("--shape_feature_dim", type=int, default=1024)
    parser.add_argument("--point_num", type=int, default=2500)
    # int8 serving path: PTQ calibrated on the input image itself — fine for
    # a single-image demo; batch serving should calibrate on representative
    # data (pose3d_tpu/serving/quant_student.py, quant_teacher.py). Student
    # quantizes the full VGG trunk; teacher mode quantizes the resnet50
    # image encoder (the FLOPs bulk) and keeps the shape/fusion tail bf16.
    parser.add_argument("--int8", action="store_true",
                        help="serve through the int8 PTQ path")
    parser.add_argument("--save_quantized", type=str, default=None,
                        help="with --int8: write the quantized pytree to "
                             "this .npz (int8 on disk, ~4x smaller than the "
                             "f32 ckpt) after calibration")
    parser.add_argument("--load_quantized", type=str, default=None,
                        help="with --int8: load a previously saved .npz "
                             "instead of calibrating")
    # AOT serving artifacts (serving/aot.py): a single serialized StableHLO
    # module with the weights baked in — batch-polymorphic, cpu+tpu, needs
    # no model code or checkpoint at serving time.
    parser.add_argument("--export_aot", type=str, default=None,
                        help="write a self-contained AOT serving artifact "
                             "(student, or PointCloud teacher with "
                             "--ply_path; honors --int8) to this path")
    parser.add_argument("--load_aot", type=str, default=None,
                        help="serve from an AOT artifact instead of a "
                             "checkpoint (--ckpt not needed)")
    return parser.parse_args(argv)


def _sample_cloud(opt):
    """Deterministic (1, point_num, 3) cloud from --ply_path (seed 0, same
    draw in live and AOT modes so predictions are comparable)."""
    from pose3d_tpu.data import ply

    verts = ply.load_vertices(opt.ply_path)
    return T.sample_pointcloud(verts, opt.point_num, 0,
                               np.random.default_rng(0))[None]


def main(argv=None):
    opt = parse_args(argv)
    from pose3d_tpu.cli.trainingKD import _load_ckpt_into

    im = Image.open(opt.img_path).convert("RGB")
    im = T.resize_pad(im, opt.input_dim)
    arr = T.normalize_image(T.to_float_array(im))[None]

    if opt.load_aot:
        # serve from the baked artifact: no model build, no checkpoint.
        from pose3d_tpu.serving import aot

        artifact = aot.load_serving(opt.load_aot)
        if artifact.n_inputs == 2:  # teacher artifact: image + point cloud
            if not opt.ply_path:
                raise SystemExit("this AOT artifact is a teacher (image + "
                                 "point cloud) — pass --ply_path")
            pc = _sample_cloud(opt)
            vp = np.array(artifact(arr, pc))[0]
        else:
            vp = np.array(artifact(arr))[0]
        vp[1] -= 90.0
        vp[2] -= 180.0
        print("pred_azi=%.2f pred_ele=%.2f pred_inp=%.2f" % tuple(vp))
        return vp
    if not opt.ckpt:
        raise SystemExit("--ckpt is required unless --load_aot is given")

    if opt.ply_path:
        opt.shape = "PointCloud"
        opt.view_num = 12
        model = common.build_teacher(opt, img_feature_dim=opt.img_feature_dim
                                     if opt.img_feature_dim != 2048 else 1024)
        pc = _sample_cloud(opt)
        variables = model.init(jax.random.key(0), jnp.asarray(arr),
                               jnp.asarray(pc), train=False)
        variables = _load_ckpt_into(variables, opt.ckpt)

        if opt.int8:
            from pose3d_tpu.serving.quant_teacher import (
                load_quantized_teacher, make_teacher_int8_infer,
                quantize_teacher_resnet)

            if opt.load_quantized:
                q = load_quantized_teacher(opt.load_quantized)
            else:
                q = quantize_teacher_resnet(variables, [arr])
            if opt.save_quantized:
                from pose3d_tpu.serving import save_quantized

                save_quantized(q, opt.save_quantized)
                print(f"quantized teacher resnet saved to {opt.save_quantized}")
            int8_infer = make_teacher_int8_infer(model)

            # q rides as a jit ARGUMENT — closing over it embeds the int8
            # weights as graph literals and stalls the remote compiler
            # (serving/quant_student.py note)
            @jax.jit
            def _infer_q(qq, v, x, p):
                outputs = int8_infer(qq, v, x, p)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

            def infer(v, x, p):
                return _infer_q(q, v, x, p)
        else:
            @jax.jit
            def infer(v, x, p):
                outputs, _, _ = model.apply(v, x, p, train=False)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

        if opt.export_aot:
            from pose3d_tpu.serving import aot

            if opt.int8:
                def fn(x, p):
                    outputs = int8_infer(q, variables, x, p)
                    return geometry.decode_predictions_inference(
                        tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)
            else:
                fn = aot.teacher_decode_fn(model, variables, opt.bin_size)
            aot.save_serving(
                aot.export_fn(fn, ((opt.input_dim, opt.input_dim, 3),
                                   (opt.point_num, 3))), opt.export_aot)
            print(f"AOT serving artifact saved to {opt.export_aot}")

        vp = np.array(infer(variables, jnp.asarray(arr), jnp.asarray(pc)))[0]
    else:
        model = common.build_student(opt, img_feature_dim=opt.img_feature_dim)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),
                               train=False)
        variables = _load_ckpt_into(variables, opt.ckpt)

        if opt.int8:
            from pose3d_tpu.serving import (load_quantized, quantize_student,
                                            save_quantized, student_int8_infer)

            if opt.load_quantized:
                q = load_quantized(opt.load_quantized)
            else:
                q = quantize_student(variables, [arr])
            if opt.save_quantized:
                save_quantized(q, opt.save_quantized)
                print(f"quantized student saved to {opt.save_quantized}")

            @jax.jit
            def infer(qq, x):
                outputs = student_int8_infer(qq, x)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

            variables = q
        else:
            @jax.jit
            def infer(v, x):
                outputs, _ = model.apply(v, x, train=False)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

        if opt.export_aot:
            from pose3d_tpu.serving import aot

            fn = (aot.student_int8_decode_fn(variables, opt.bin_size)
                  if opt.int8 else
                  aot.student_decode_fn(model, variables, opt.bin_size))
            aot.save_serving(aot.export_serving(fn, opt.input_dim),
                             opt.export_aot)
            print(f"AOT serving artifact saved to {opt.export_aot}")

        vp = np.array(infer(variables, jnp.asarray(arr)))[0]  # copy: device arrays are read-only
    # back to annotation convention (inference_imageBased.py:61-62)
    vp[1] -= 90.0
    vp[2] -= 180.0
    print("pred_azi=%.2f pred_ele=%.2f pred_inp=%.2f" % tuple(vp))
    return vp


if __name__ == "__main__":
    main()
