"""Single-image inference CLI.

Parity with /root/reference/inference_imageBased.py (the working one; the
teacher `inference.py` imports a module missing from the reference repo,
SURVEY.md §2 #24): loads a student checkpoint, resize-pads the image to 224,
normalizes, runs the inference decoder (compute_vp_pred: (bin + raw delta) *
bin_size clamped to [0, 360]) and converts back to annotation convention
(ele -= 90, inp -= 180).

Teacher modes (both broken-in-the-reference paths, working here):
  * --ply_path  — PointCloud teacher (image + sampled cloud);
  * --render_dir — MultiView teacher (image + a (1, K, h, w, 3) render ring
    read with the reference's azimuth-ring index arithmetic,
    reference inference.py:55-107 / dataset.py:84-118).
Both support --int8 and --export_aot/--load_aot. AOT artifacts record their
own input geometry: --load_aot resizes the image to the ARTIFACT's input_dim,
samples the artifact's point count, and tells cloud from render teachers by
the second input's rank (3 = cloud, 5 = renders).
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
                        help="point cloud for PointCloud-teacher inference")
    parser.add_argument("--render_dir", type=str, default=None,
                        help="directory of CAD render crops for MultiView-"
                             "teacher inference (the reference inference.py "
                             "render path, minus its missing-module crash)")
    parser.add_argument("--view_num", type=int, default=12)
    parser.add_argument("--tour", type=int, default=2)
    parser.add_argument("--mutation", type=int, default=0,
                        help="azimuth-ring roll for --render_dir")
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


def _sample_cloud(opt, point_num=None):
    """Deterministic (1, point_num, 3) cloud from --ply_path (seed 0, same
    draw in live and AOT modes so predictions are comparable)."""
    from pose3d_tpu.data import ply

    verts = ply.load_vertices(opt.ply_path)
    return T.sample_pointcloud(verts, point_num or opt.point_num, 0,
                               np.random.default_rng(0))[None]


def _load_renders(render_dir, view_num, tour, mutation, size):
    """(1, view_num, size, size, 3) f32 render ring from a crop directory —
    the reference's read_multiviwes semantics (dataset.py:84-118): sorted
    file list indexed by the azimuth-ring arithmetic."""
    import os

    names = sorted(os.listdir(render_dir))
    ids = T.multiview_ids(view_num, tour, mutation)
    if len(names) <= int(ids.max()):
        raise SystemExit(f"--render_dir has {len(names)} files; the "
                         f"view_num={view_num}/tour={tour} ring needs "
                         f"{int(ids.max()) + 1}")
    renders = []
    for i in ids:
        im = Image.open(os.path.join(render_dir, names[int(i)])).convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        renders.append(T.to_float_array(im))
    return np.stack(renders)[None].astype(np.float32)


def _prep_image(opt, input_dim):
    im = Image.open(opt.img_path).convert("RGB")
    im = T.resize_pad(im, input_dim)
    return T.normalize_image(T.to_float_array(im))[None]


def main(argv=None):
    opt = parse_args(argv)
    from pose3d_tpu.cli.trainingKD import _load_ckpt_into

    if opt.ply_path and opt.render_dir:
        raise SystemExit("--ply_path (PointCloud teacher) and --render_dir "
                         "(MultiView teacher) are mutually exclusive")

    if opt.load_aot:
        # serve from the baked artifact: no model build, no checkpoint. The
        # artifact's OWN recorded geometry drives the preprocessing (image
        # size, point count, view count) — the CLI flags that produced the
        # export need not be repeated (ADVICE r4).
        from pose3d_tpu.serving import aot

        artifact = aot.load_serving(opt.load_aot)
        arr = _prep_image(opt, artifact.input_dim)
        if artifact.n_inputs == 2:
            shape_in = artifact.in_shapes[1]
            if len(shape_in) == 2:  # (P, 3): PointCloud teacher
                if not opt.ply_path:
                    raise SystemExit("this AOT artifact is a PointCloud "
                                     "teacher (image + cloud) — pass "
                                     "--ply_path")
                pc = _sample_cloud(opt, point_num=shape_in[0])
                vp = np.array(artifact(arr, pc))[0]
            elif len(shape_in) == 4:  # (K, h, w, 3): MultiView teacher
                if not opt.render_dir:
                    raise SystemExit("this AOT artifact is a MultiView "
                                     "teacher (image + render ring) — pass "
                                     "--render_dir")
                renders = _load_renders(opt.render_dir, shape_in[0], opt.tour,
                                        opt.mutation, shape_in[1])
                vp = np.array(artifact(arr, renders))[0]
            else:
                raise SystemExit("unrecognized teacher artifact: second "
                                 f"input shape {shape_in}")
        else:
            vp = np.array(artifact(arr))[0]
        vp[1] -= 90.0
        vp[2] -= 180.0
        print("pred_azi=%.2f pred_ele=%.2f pred_inp=%.2f" % tuple(vp))
        return vp
    if not opt.ckpt:
        raise SystemExit("--ckpt is required unless --load_aot is given")
    arr = _prep_image(opt, opt.input_dim)

    if opt.render_dir:
        # MultiView teacher: the working equivalent of the reference's
        # broken render-based inference.py (SURVEY.md §2 #24)
        opt.shape = "MultiView"
        model = common.build_teacher(opt, img_feature_dim=opt.img_feature_dim
                                     if opt.img_feature_dim != 2048 else 1024)
        renders = _load_renders(opt.render_dir, opt.view_num, opt.tour,
                                opt.mutation, opt.input_dim)
        variables = model.init(jax.random.key(0), jnp.asarray(arr),
                               jnp.asarray(renders), train=False)
        variables = _load_ckpt_into(variables, opt.ckpt)

        if opt.int8:
            from pose3d_tpu.serving.quant_teacher import (
                make_teacher_int8_infer, quantize_teacher_mv)

            q = quantize_teacher_mv(variables, [arr], [renders])
            if opt.save_quantized:
                from pose3d_tpu.serving import save_quantized

                save_quantized(q, opt.save_quantized)
                print(f"quantized MV teacher saved to {opt.save_quantized}")
            int8_infer = make_teacher_int8_infer(model)

            @jax.jit
            def _infer_q(qq, v, x, r):
                outputs = int8_infer(qq, v, x, r)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

            def infer(v, x, r):
                return _infer_q(q, v, x, r)
        else:
            @jax.jit
            def infer(v, x, r):
                outputs, _, _ = model.apply(v, x, r, train=False)
                return geometry.decode_predictions_inference(
                    tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)

        if opt.export_aot:
            from pose3d_tpu.serving import aot

            if opt.int8:
                def fn(x, r):
                    outputs = int8_infer(q, variables, x, r)
                    return geometry.decode_predictions_inference(
                        tuple(outputs[:3]), tuple(outputs[3:]), opt.bin_size)
            else:
                fn = aot.teacher_decode_fn(model, variables, opt.bin_size)
            aot.save_serving(
                aot.export_fn(fn, ((opt.input_dim, opt.input_dim, 3),
                                   (opt.view_num, opt.input_dim,
                                    opt.input_dim, 3))), opt.export_aot)
            print(f"AOT serving artifact saved to {opt.export_aot}")

        vp = np.array(infer(variables, jnp.asarray(arr),
                            jnp.asarray(renders)))[0]
    elif opt.ply_path:
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
