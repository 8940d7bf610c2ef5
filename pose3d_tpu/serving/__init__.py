"""Serving-only paths: post-training int8 quantization of the student.

Not part of the reference surface (the reference serves the torch student in
fp32 — inference.py); this is a TPU-native serving extension exploiting the
MXU's s8xs8->s32 path (~1.4-1.8x over bf16 on the student's hot convs,
benchmarks/int8_probe.py).
"""

from pose3d_tpu.serving.quant_student import (  # noqa: F401
    quantize_student,
    student_int8_infer,
)
