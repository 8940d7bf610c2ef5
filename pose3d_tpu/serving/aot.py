"""Serialized ahead-of-time serving artifacts via `jax.export`.

The reference deploys by shipping a torch checkpoint *plus* the model code
(`/root/reference/inference_imageBased.py:20-35` rebuilds the net and loads
the .pth). A pose3d_tpu AOT artifact instead bakes the trained weights into
a single serialized StableHLO module:

  * self-contained — serving needs NO model code and NO checkpoint, only
    `load_serving(path)` (jax + this loader);
  * batch-polymorphic — one artifact serves any batch size (the leading dim
    is exported symbolically);
  * multi-platform — lowered for cpu AND tpu by default, so the same file
    runs in a CPU canary and on the serving chip (the axon PJRT plugin
    reports platform "tpu", verified live);
  * version-pinned — jax.export's calling-convention versioning and its
    platform/shape safety checks run at call time, unlike a pickled fn.

Every serving family exports through the same entry point: the bf16 flax
eval graphs (student, PointCloud/MultiView teacher) and the int8 PTQ graph
(serving/quant_student.py) are each just a `fn(*inputs) -> (b, 3)` closure
here. Weights ride as closed-over arrays,
which `jax.export` hoists into module constants — this is the one place
where embedding weights in the graph is the POINT (a frozen artifact), in
deliberate contrast to the live-serving rule that params stay jit
arguments (serving/quant_student.py note on remote const-folding).

CLI surface: `cli/inference.py --export_aot` / `--load_aot`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from pose3d_tpu import geometry

#: default lowering targets; order is irrelevant (call-time dispatch picks
#: the running backend's entry).
PLATFORMS = ("cpu", "tpu")


def student_decode_fn(model, variables, bin_size):
    """images (b, H, W, 3) f32 -> decoded viewpoints (b, 3) f32.

    The six-head eval forward + the inference decoder
    (geometry.decode_predictions_inference), exactly the jitted fn the
    inference CLI serves live.
    """

    def fn(x):
        outputs, _ = model.apply(variables, x, train=False)
        return geometry.decode_predictions_inference(
            tuple(outputs[:3]), tuple(outputs[3:]), bin_size)

    return fn


def student_int8_decode_fn(q, bin_size):
    """int8 PTQ variant of `student_decode_fn` (quantized pytree baked in)."""
    from pose3d_tpu.serving.quant_student import student_int8_infer

    def fn(x):
        outputs = student_int8_infer(q, x)
        return geometry.decode_predictions_inference(
            tuple(outputs[:3]), tuple(outputs[3:]), bin_size)

    return fn


def teacher_decode_fn(model, variables, bin_size):
    """(images (b, H, W, 3), shape input) -> decoded viewpoints (b, 3).

    Teacher eval forward + the inference decoder; the shape input —
    clouds (b, P, 3) for PointCloud, renders (b, K, h, w, 3) for MultiView
    — is exported alongside the image, so one artifact serves any (image,
    shape) pair at any batch size.
    """

    def fn(x, pc):
        outputs, _, _ = model.apply(variables, x, pc, train=False)
        return geometry.decode_predictions_inference(
            tuple(outputs[:3]), tuple(outputs[3:]), bin_size)

    return fn


def export_fn(fn, per_sample_shapes, *, dtypes=None,
              platforms=PLATFORMS) -> bytes:
    """Serialize `fn(*inputs) -> preds`, batch dimension symbolic.

    `per_sample_shapes`: one shape tuple per input, WITHOUT the batch dim —
    all inputs share the same symbolic leading dim. `fn` must close over
    its weights; jax.export hoists them into module constants, making the
    returned bytes fully self-contained.
    """
    (b,) = jax_export.symbolic_shape("b")
    dtypes = dtypes or (jnp.float32,) * len(per_sample_shapes)
    specs = tuple(jax.ShapeDtypeStruct((b,) + tuple(s), d)
                  for s, d in zip(per_sample_shapes, dtypes))
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*specs)
    return exp.serialize()


def export_serving(fn, input_dim, *, channels=3, dtype=jnp.float32,
                   platforms=PLATFORMS) -> bytes:
    """Serialize the single-input `fn(images) -> preds` (student paths)."""
    return export_fn(fn, ((input_dim, input_dim, channels),),
                     dtypes=(dtype,), platforms=platforms)


def save_serving(data: bytes, path: str) -> None:
    with open(path, "wb") as f:
        f.write(data)


class ServingArtifact:
    """A loaded AOT artifact: call it on numpy/JAX input batches."""

    def __init__(self, exported):
        self._exported = exported
        # (b, H, W, C) image spec — H gives the expected input_dim.
        self.input_dim = exported.in_avals[0].shape[1]
        self.platforms = exported.platforms
        self._dtypes = tuple(a.dtype for a in exported.in_avals)
        self.n_inputs = len(exported.in_avals)  # 1=student, 2=teacher
        # per-input shapes WITHOUT the symbolic batch dim: the artifact is
        # the source of truth for its own geometry — consumers preprocess to
        # THESE, not to whatever flags produced the export (ADVICE r4). The
        # second entry's rank tells teacher families apart: (P, 3) cloud vs
        # (K, h, w, 3) render ring.
        self.in_shapes = tuple(tuple(a.shape[1:]) for a in exported.in_avals)

    def __call__(self, *inputs):
        return self._exported.call(
            *(jnp.asarray(x, d) for x, d in zip(inputs, self._dtypes)))


def load_serving(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        return ServingArtifact(jax_export.deserialize(f.read()))
