"""Serving-only paths: post-training int8 quantization.

Not part of the reference surface (the reference serves the torch models in
fp32 — inference.py); this is a TPU-native serving extension exploiting the
MXU's s8xs8->s32 path (~1.4-1.8x over bf16 on the hot convs,
benchmarks/int8_probe.py). quant_student covers the full VGG student trunk;
quant_teacher covers the teacher's resnet50 image encoder (its FLOPs bulk)
with the shape/fusion tail kept bf16.
"""

from pose3d_tpu.serving.quant_student import (  # noqa: F401
    load_quantized,
    quantize_student,
    save_quantized,
    student_int8_infer,
)
from pose3d_tpu.serving.quant_teacher import (  # noqa: F401
    load_quantized_teacher,
    make_teacher_int8_infer,
    quantize_resnet,
    quantize_teacher_mv,
    quantize_teacher_resnet,
    quantize_teacher_vanilla,
    resnet50_int8_forward,
    resnet_int8_forward,
)
