"""Shared CLI plumbing: flag sets mirroring the reference argparse interfaces
(training.py:155-191, trainingKD.py:91-133, testing.py:15-38), model/dataset
builders, and seed handling (reference fixes seed 46, training.py:195)."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.data import datasets
from pose3d_tpu.data.annotations import (
    OBJECTNET3D_TEST_CATS,
    PASCAL3D_TEST_CATS,
    PIX3D_TEST_CATS,
    LINEMOD_TEST_CATS,
)
from pose3d_tpu.models import BaselineEstimator, PoseEstimator, PoseEstimatorVanilla

MANUAL_SEED = 46  # reference fixed seed (training.py:195-198)

# Persistent XLA compilation cache: first compiles of the full models cost
# minutes through the remote-compile path; subsequent CLI invocations hit disk.
_CACHE_DIR = os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/pose3d_jax_cache")
if _CACHE_DIR:
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def add_common_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--loader", type=str, default="thread",
                        choices=["thread", "shm"],
                        help="train-loader backend: GIL-sharing threads or "
                             "shared-memory process workers (scales with "
                             "host cores; see data/shm_loader.py)")
    parser.add_argument("--model", type=str, default=None, help="optional reload model path")
    parser.add_argument("--img_feature_dim", type=int, default=1024)
    parser.add_argument("--shape_feature_dim", type=int, default=256)
    parser.add_argument("--bin_size", type=int, default=15)
    parser.add_argument("--dataset", type=str, default=None,
                        choices=["ObjectNet3D", "Pascal3D", "ShapeNetCore", "Pix3D",
                                 "LineMod"])
    parser.add_argument("--data_root", type=str, default="data",
                        help="root containing <dataset>/ trees (reference hard-codes 'data')")
    parser.add_argument("--shape_dir", type=str, default="Renders_semi_sphere",
                        choices=["Renders_semi_sphere", "pointcloud"])
    parser.add_argument("--shape", type=str, default="MultiView",
                        choices=["MultiView", "PointCloud", "None"])
    parser.add_argument("--view_num", type=int, default=12)
    parser.add_argument("--tour", type=int, default=2)
    parser.add_argument("--novel", action="store_true")
    parser.add_argument("--keypoint", action="store_true")
    parser.add_argument("--shot", type=int, default=None)
    parser.add_argument("--random", action="store_true")
    parser.add_argument("--random_range", type=int, default=0)
    parser.add_argument("--input_dim", type=int, default=224)
    parser.add_argument("--point_num", type=int, default=2500)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute dtype (TPU MXU fast path)")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="data-parallel device count (default: all local)")
    parser.add_argument("--cache_decoded_mb", type=float, default=0.0,
                        help="LRU-cache decoded images up to this many MB per "
                             "loader process so epochs >= 2 skip JPEG decode "
                             "(exact; 0 = off = reference behavior). See "
                             "data/decode_cache.py")


def make_train_loader(dataset, opt, *, seed: int = MANUAL_SEED):
    """Train-loader factory honoring --loader.

    'thread' = in-process thread pool (loader.DataLoader); 'shm' =
    shared-memory process workers (shm_loader.ShmDataLoader), which scale
    with host cores instead of sharing the GIL with the train loop."""
    kw = dict(batch_size=opt.batch_size, shuffle=True,
              drop_last=len(dataset) > opt.batch_size,
              num_workers=opt.workers, seed=seed)
    if getattr(opt, "loader", "thread") == "shm":
        from pose3d_tpu.data.shm_loader import ShmDataLoader

        return ShmDataLoader(dataset, **kw)
    from pose3d_tpu.data.loader import DataLoader

    return DataLoader(dataset, **kw)


def maybe_shape_bank(opt, dataset_train):
    """--device_shapes: build the device-resident cloud bank
    (ops/shape_bank.py) and flip the train dataset to 3-scalar emission.
    Returns the ShapeBank (or None when the flag is off)."""
    if not getattr(opt, "device_shapes", False):
        return None
    if opt.shape not in ("PointCloud", "MultiView"):
        raise SystemExit("--device_shapes requires --shape PointCloud or "
                         "MultiView")
    if not hasattr(dataset_train, "device_shapes"):
        raise SystemExit("--device_shapes: this dataset has no shape-bank "
                         "support")
    dataset_train.device_shapes = True
    from pose3d_tpu.ops.shape_bank import RenderBank, ShapeBank

    if opt.shape == "MultiView":
        renders, id_table = dataset_train.build_render_bank()
        print(f"render bank: {renders.shape[0]} models x {renders.shape[1]} "
              f"renders @ {renders.shape[2]}px "
              f"({renders.nbytes / (1 << 20):.1f} MB u8 device-resident)")
        return RenderBank.from_arrays(renders, id_table)
    verts, counts = dataset_train.build_shape_bank()
    print(f"shape bank: {verts.shape[0]} clouds x {verts.shape[1]} verts "
          f"({verts.nbytes / (1 << 20):.1f} MB device-resident)")
    return ShapeBank.from_arrays(verts, counts, opt.point_num)


def normalize_shape(opt) -> None:
    if opt.shape == "None":
        opt.shape = None


def compute_dtype(opt):
    return jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32


def num_classes(bin_size: int) -> tuple[int, int, int]:
    return int(360 / bin_size), int(180 / bin_size), int(360 / bin_size)


def build_student(opt, img_feature_dim=None):
    azi, ele, inp = num_classes(opt.bin_size)
    return BaselineEstimator(
        img_feature_dim=img_feature_dim or opt.img_feature_dim,
        azi_classes=azi, ele_classes=ele, inp_classes=inp,
        bin_size=opt.bin_size, dtype=compute_dtype(opt),
        width_mult=getattr(opt, "student_width_mult", 1.0))


def build_teacher(opt, img_feature_dim=None, shape_feature_dim=None):
    azi, ele, inp = num_classes(opt.bin_size)
    return PoseEstimator(
        shape=opt.shape, view_num=opt.view_num,
        img_feature_dim=img_feature_dim or opt.img_feature_dim,
        shape_feature_dim=shape_feature_dim or opt.shape_feature_dim,
        azi_classes=azi, ele_classes=ele, inp_classes=inp,
        dtype=compute_dtype(opt))


def build_vanilla(opt):
    azi, ele, inp = num_classes(opt.bin_size)
    return PoseEstimatorVanilla(
        shape=opt.shape, view_num=opt.view_num,
        img_feature_dim=opt.img_feature_dim,
        shape_feature_dim=opt.shape_feature_dim,
        azi_classes=azi, ele_classes=ele, inp_classes=inp,
        dtype=compute_dtype(opt))


def test_cats_for(dataset: str):
    return {
        "ObjectNet3D": OBJECTNET3D_TEST_CATS,
        "Pascal3D": PASCAL3D_TEST_CATS,
        "Pix3D": PIX3D_TEST_CATS,
        "LineMod": LINEMOD_TEST_CATS,
    }[dataset]


def build_train_eval_datasets(opt, contrast_eval: bool = False):
    """Dataset selection per --dataset, mirroring training.py:205-239.

    contrast_eval=True reproduces trainingKD.py:157-160, which evaluates on
    Pascal3DContrast (adds the has_keypoints==1 val filter) instead of
    Pascal3D.
    """
    root_dir = os.path.join(opt.data_root, opt.dataset)
    annotation_file = f"{opt.dataset}.txt"
    common = dict(shape=opt.shape, shape_dir=opt.shape_dir, view_num=opt.view_num,
                  tour=opt.tour, input_dim=opt.input_dim, point_num=opt.point_num,
                  decode_cache_mb=getattr(opt, "cache_decoded_mb", 0.0))

    if opt.dataset == "ObjectNet3D":
        cats = OBJECTNET3D_TEST_CATS
        dataset_train = datasets.Pascal3DContrast(
            root_dir, annotation_file, train=True, cat_choice=cats,
            keypoint=opt.keypoint, novel=opt.novel, random_range=opt.random_range,
            shot=opt.shot, seed=MANUAL_SEED, **common)
        if contrast_eval:
            dataset_eval = datasets.Pascal3DContrast(
                root_dir, annotation_file, train=False, cat_choice=cats,
                keypoint=opt.keypoint, novel=opt.novel, **common)
        else:
            dataset_eval = datasets.Pascal3D(
                root_dir, annotation_file, train=False, cat_choice=cats,
                keypoint=opt.keypoint, novel=opt.novel, random=False, **common)
    elif opt.dataset == "Pascal3D":
        cats = ["bus", "motorbike"] if opt.novel else None
        dataset_train = datasets.Pascal3D(
            root_dir, annotation_file, train=True, cat_choice=cats, novel=opt.novel,
            random=opt.random, random_range=opt.random_range, **common)
        dataset_eval = datasets.Pascal3D(
            root_dir, annotation_file, train=False, cat_choice=cats, novel=opt.novel,
            random=False, **common)
    elif opt.dataset == "ShapeNetCore":
        bg_dir = os.path.join(opt.data_root, "SUN")
        dataset_train = datasets.ShapeNet(
            root_dir, annotation_file, bg_dir=bg_dir, train=True, random=opt.random,
            cat_choice=["2818832", "2871439", "2933112", "3001627", "4256520",
                        "4379243"],
            novel=opt.novel, shape=opt.shape, shape_dir=opt.shape_dir,
            view_num=opt.view_num, tour=opt.tour, random_range=opt.random_range,
            decode_cache_mb=getattr(opt, "cache_decoded_mb", 0.0))
        dataset_eval = datasets.Pix3D(
            os.path.join(opt.data_root, "Pix3D"), "Pix3D.txt", shape=opt.shape,
            view_num=opt.view_num, tour=opt.tour)
    else:
        raise SystemExit(f"unsupported training dataset {opt.dataset}")
    return dataset_train, dataset_eval


def build_kd_datasets(opt):
    """Dataset selection for the KD CLI, mirroring trainingKD.py:148-200.

    The 3-view regimes (--contrast / --crd / --stage 2) train and evaluate on
    Pascal3DContrast (7-key samples); --stage 1 trains on plain Pascal3D
    (blur/crop/flip/rot aug, 3-key samples) and evaluates on plain Pascal3D —
    the reference does this on BOTH datasets (trainingKD.py:153/161 for
    ObjectNet3D, 171/179 for Pascal3D).

    One documented deviation: the reference's Pascal3D branch builds the
    contrast dataset only for --contrast/--crd (trainingKD.py:171), so its
    `--dataset Pascal3D --stage 2` crashes unpacking the 7-tuple
    (base_class.py:605-607). Stage 2 needs the 3-view batch by construction,
    so here stage 2 selects Pascal3DContrast on both datasets (defect fixed,
    not replicated — SURVEY.md §7 "reference defects").

    The reference passes `random=opt.random` to Pascal3DContrast, but the
    class stores and never uses it (mutation is pinned 0 in its __getitem__,
    dataset.py:588) — our Pascal3DContrast omits the dead parameter.
    """
    root_dir = os.path.join(opt.data_root, opt.dataset)
    annotation_file = f"{opt.dataset}.txt"
    common = dict(shape=opt.shape, shape_dir=opt.shape_dir, view_num=opt.view_num,
                  tour=opt.tour, input_dim=opt.input_dim, point_num=opt.point_num,
                  decode_cache_mb=getattr(opt, "cache_decoded_mb", 0.0))
    three_view = opt.contrast or opt.crd or opt.stage == 2

    if opt.dataset in ("ObjectNet3D", "Pascal3D"):
        if opt.dataset == "ObjectNet3D":
            cats = OBJECTNET3D_TEST_CATS
            extra = dict(keypoint=opt.keypoint)
        else:
            cats = ["bus", "motorbike"] if opt.novel else None
            extra = {}
        if three_view:
            dataset_train = datasets.Pascal3DContrast(
                root_dir, annotation_file, train=True, cat_choice=cats,
                novel=opt.novel, random_range=opt.random_range,
                shot=opt.shot if opt.dataset == "ObjectNet3D" else None,
                seed=MANUAL_SEED, **extra, **common)
            dataset_eval = datasets.Pascal3DContrast(
                root_dir, annotation_file, train=False, cat_choice=cats,
                novel=opt.novel, **extra, **common)
        else:  # stage 1
            dataset_train = datasets.Pascal3D(
                root_dir, annotation_file, train=True, cat_choice=cats,
                novel=opt.novel, random=opt.random,
                random_range=opt.random_range, **extra, **common)
            dataset_eval = datasets.Pascal3D(
                root_dir, annotation_file, train=False, cat_choice=cats,
                novel=opt.novel, random=False, **extra, **common)
        return dataset_train, dataset_eval
    if opt.dataset == "ShapeNetCore":
        # same synthetic-train/real-eval pair as the teacher CLI
        # (trainingKD.py:187-198 == training.py:227-239)
        return build_train_eval_datasets(opt)
    raise SystemExit(f"unsupported KD training dataset {opt.dataset}")


def make_dp_mesh(opt):
    """All-devices data-parallel mesh. A batch_size that doesn't divide the
    device count is PADDED per step (trainer._device_batch + parallel/mesh
    pad_batch: replicated rows marked invalid and masked out of BN stats,
    losses, grads and metrics) rather than shrinking the mesh — the reference
    KD recipe's bs=46 uses all 8 chips of a v4-8. Only when batch_size <
    device count (padding would exceed the real work) does the mesh shrink
    to batch_size devices."""
    from pose3d_tpu.parallel import make_mesh

    devices = jax.devices()
    if opt.n_devices is not None:
        devices = devices[: opt.n_devices]
    n = min(len(devices), opt.batch_size)
    if n != len(devices):
        print(f"data-parallel mesh shrunk to {n} devices "
              f"(batch_size {opt.batch_size} < {len(devices)} devices)")
    if n <= 1:
        return None
    return make_mesh(devices[:n])
