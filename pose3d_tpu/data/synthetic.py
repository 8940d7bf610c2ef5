"""Synthetic dataset fixtures: a fake ObjectNet3D/Pascal3D-style tree so
tests, CI and benchmarks never need the real (multi-GB) downloads
(SURVEY.md §4 'fake-dataset fixtures').

Layout produced by `make_objectnet3d_fixture(root)`:
  root/
    ObjectNet3D.txt            — annotation CSV with the reference's columns
    Images/<cat>_<i>.jpg       — small random RGB images
    pointcloud/<cat>/<XX>/compressed.ply
    Renders_semi_sphere/<cat>/<XX>/crop/render_NNN.png  (216 tiny renders)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from PIL import Image

from pose3d_tpu.data import ply


def make_objectnet3d_fixture(
    root: str,
    categories: tuple[str, ...] = ("bed", "chair"),
    n_train_per_cat: int = 6,
    n_val_per_cat: int = 4,
    image_size: int = 96,
    n_vertices: int = 300,
    with_renders: bool = False,
    n_renders: int = 216,
    render_size: int = 32,
    seed: int = 0,
    dataset_name: str = "ObjectNet3D",
) -> str:
    """Build the tree and return the annotation filename.

    dataset_name="Pascal3D" emits the same tree with a Pascal3D.txt
    annotation file (Pascal3D+ and ObjectNet3D share the loader; only the
    ObjectNet3D.txt-gated keypoint filters and azimuth wrap differ —
    reference dataset.py:177-185)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "Images"), exist_ok=True)

    rows = []
    for cat in categories:
        for split, n in (("train", n_train_per_cat), ("val", n_val_per_cat)):
            for i in range(n):
                name = f"{cat}_{split}_{i}.jpg"
                img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(root, "Images", name))
                w = int(rng.integers(image_size // 2, image_size))
                h = int(rng.integers(image_size // 2, image_size))
                left = int(rng.integers(0, image_size - w + 1))
                upper = int(rng.integers(0, image_size - h + 1))
                rows.append(
                    dict(
                        im_path=os.path.join("Images", name),
                        cat=cat,
                        cad_index=1 + int(rng.integers(0, 2)),
                        set=split,
                        left=left,
                        upper=upper,
                        right=left + w,
                        lower=upper + h,
                        azimuth=float(rng.integers(-180, 180)),
                        elevation=float(rng.integers(-89, 89)),
                        inplane_rotation=float(rng.integers(-179, 179)),
                        difficult=0,
                        truncated=0,
                        occluded=0,
                        has_keypoints=1,
                    )
                )

    frame = pd.DataFrame(rows)
    annotation_file = f"{dataset_name}.txt"
    frame.to_csv(os.path.join(root, annotation_file), index=False)

    for cat in categories:
        for cad in (1, 2):
            pc_dir = os.path.join(root, "pointcloud", cat, "%02d" % cad)
            os.makedirs(pc_dir, exist_ok=True)
            verts = rng.standard_normal((n_vertices, 3)).astype(np.float32)
            ply.write_ply(os.path.join(pc_dir, "compressed.ply"), verts)
            if with_renders:
                rdir = os.path.join(root, "Renders_semi_sphere", cat, "%02d" % cad, "crop")
                os.makedirs(rdir, exist_ok=True)
                for k in range(n_renders):
                    img = (rng.random((render_size, render_size, 3)) * 255).astype(np.uint8)
                    Image.fromarray(img).save(os.path.join(rdir, "render_%03d.png" % k))

    return annotation_file


def make_linemod_fixture(
    root: str,
    obj_ids: tuple[int, ...] = (1, 2),
    n_per_obj: int = 4,
    image_size: int = 96,
    seed: int = 0,
) -> str:
    """LineMod-style annotation (obj_id, x/y/w/h bbox) + images."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rows = []
    for obj in obj_ids:
        for i in range(n_per_obj):
            name = f"obj{obj}_{i}.jpg"
            img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, "imgs", name))
            w = int(rng.integers(image_size // 2, image_size - 4))
            h = int(rng.integers(image_size // 2, image_size - 4))
            rows.append(
                dict(
                    obj_id=obj,
                    image_path=os.path.join("imgs", name),
                    x=int(rng.integers(0, image_size - w)),
                    y=int(rng.integers(0, image_size - h)),
                    w=w,
                    h=h,
                    azimuth=float(rng.integers(0, 360)),
                    elevation=float(rng.integers(-89, 89)),
                    inplane_rotation=float(rng.integers(-179, 179)),
                )
            )
    frame = pd.DataFrame(rows)
    annotation_file = "LineMod.txt"
    frame.to_csv(os.path.join(root, annotation_file), index=False)
    return annotation_file


def make_shapenet_fixture(
    root: str,
    bg_root: str,
    cat_ids: tuple[int, ...] = (2818832,),
    n_examples: int = 2,
    n_views: int = 3,
    image_size: int = 96,
    seed: int = 0,
    with_shape_renders: bool = False,
    n_shape_renders: int = 144,
    shape_render_size: int = 24,
) -> str:
    """ShapeNet-style synthetic renders (RGBA) + SUN background list."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "renders"), exist_ok=True)
    os.makedirs(os.path.join(bg_root, "bg"), exist_ok=True)

    # backgrounds + SUN list csv (index column + path column, read via iloc[:, 1])
    bg_rows = []
    for i in range(3):
        name = os.path.join("bg", f"bg_{i}.jpg")
        img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(bg_root, name))
        bg_rows.append(dict(idx=i, path=name))
    pd.DataFrame(bg_rows).to_csv(os.path.join(bg_root, "SUN_database.txt"), index=False)

    rows = []
    for cat in cat_ids:
        for ex in range(n_examples):
            example_id = f"ex{ex}"
            for v in range(n_views):
                name = os.path.join("renders", f"{cat}_{example_id}_{v}.png")
                img = (rng.random((image_size, image_size, 4)) * 255).astype(np.uint8)
                Image.fromarray(img, "RGBA").save(os.path.join(root, name))
                rows.append(
                    dict(
                        cat_id=cat,
                        example_id=example_id,
                        image_path=name,
                        azimuth=float(rng.integers(0, 360)),
                        elevation=float(rng.integers(-89, 89)),
                    )
                )
    if with_shape_renders:
        for cat in cat_ids:
            for ex in range(n_examples):
                rdir = os.path.join(root, "Renders_semi_sphere", "%08d" % cat,
                                    f"ex{ex}", "crop")
                os.makedirs(rdir, exist_ok=True)
                for k in range(n_shape_renders):
                    img = (rng.random((shape_render_size, shape_render_size, 3))
                           * 255).astype(np.uint8)
                    Image.fromarray(img).save(os.path.join(rdir, "r_%03d.png" % k))

    frame = pd.DataFrame(rows)
    annotation_file = "ShapeNetCore.txt"
    frame.to_csv(os.path.join(root, annotation_file), index=False)
    return annotation_file


def make_pix3d_eval_fixture(
    root: str,
    cat_ids: tuple[str, ...] = ("bed", "chair"),
    n_per_cat: int = 3,
    image_size: int = 64,
    seed: int = 0,
) -> str:
    """Plain-Pix3D-style annotation (cat_id/example_id/model_name columns,
    boolean occlusion flags, radian inplane) for the eval-only Pix3D loader."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rows = []
    for cat in cat_ids:
        for i in range(n_per_cat):
            name = f"{cat}_{i}.jpg"
            img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, "imgs", name))
            rows.append(
                dict(
                    image_path=os.path.join("imgs", name),
                    cat_id=cat,
                    example_id=f"ex{i}",
                    model_name="model",
                    truncated=False,
                    occluded=False,
                    slightly_occluded=False,
                    azimuth=float(rng.integers(0, 360)),
                    elevation=float(rng.integers(-89, 89)),
                    inplane_rotation=float(rng.uniform(-np.pi, np.pi)),
                )
            )
    frame = pd.DataFrame(rows)
    annotation_file = "Pix3D.txt"
    frame.to_csv(os.path.join(root, annotation_file), index=False)
    return annotation_file


def make_pix3d_fixture(
    root: str,
    categories: tuple[str, ...] = ("bed", "chair"),
    n_per_cat: int = 4,
    image_size: int = 96,
    seed: int = 0,
) -> str:
    """Pix3DContrast-style annotation (cls_name column) + images."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rows = []
    for cat in categories:
        for split in ("train", "val"):
            for i in range(n_per_cat):
                name = f"{cat}_{split}_{i}.jpg"
                img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(root, "imgs", name))
                w = int(rng.integers(image_size // 2, image_size))
                h = int(rng.integers(image_size // 2, image_size))
                left = int(rng.integers(0, image_size - w + 1))
                upper = int(rng.integers(0, image_size - h + 1))
                rows.append(
                    dict(
                        im_path=os.path.join("imgs", name),
                        cls_name=cat,
                        set=split,
                        left=left,
                        upper=upper,
                        right=left + w,
                        lower=upper + h,
                        azimuth=float(rng.integers(0, 360)),
                        elevation=float(rng.integers(-89, 89)),
                        inplane_rotation=float(rng.integers(-179, 179)),
                        difficult=0,
                        truncated=0,
                        occluded=0,
                        has_keypoints=1,
                    )
                )
    frame = pd.DataFrame(rows)
    annotation_file = "Pix3D.txt"
    frame.to_csv(os.path.join(root, annotation_file), index=False)
    return annotation_file
