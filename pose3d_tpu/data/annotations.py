"""Annotation-frame loading and filtering.

Reproduces the reference's pandas filter chains row-for-row
(auxiliary/dataset.py):
  * pascal3d_frame        — Pascal3D / Pascal3DContrast filters
    (dataset.py:177-199, 460-495): elevation != 90, difficult == 0,
    ObjectNet3D keypoint/truncated/occluded gating + azimuth wrap,
    train/val split, category include/exclude (novel), per-class train_cls
    filter, few-shot per-class sampling.
  * pix3d_frame           — Pix3D eval filters + unit conversion
    (dataset.py:636-644): ele += 90, inplane rad->deg + 180.
  * pix3d_contrast_frame  — Pix3DContrast (dataset.py:763-801).
  * linemod_frame         — Linemod obj_id selection (dataset.py:704-709).
  * shapenet_frame        — ShapeNet model_number cap per category
    (dataset.py:324-340).

Unlike the reference (positional `iloc[idx, 9:12]` label reads), labels are
read by column name: annotation files must carry `azimuth`, `elevation`,
`inplane_rotation` columns — robust to column reordering and what the
synthetic fixtures emit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

LABEL_COLS = ["azimuth", "elevation", "inplane_rotation"]

# categories whose canonical frame must not be azimuth-randomized
# (dataset.py:173-175)
BAD_CATS = [
    "ashtray", "basket", "bottle", "bucket", "can", "cap", "cup",
    "fire_extinguisher", "fish_tank", "flashlight", "helmet", "jar",
    "paintbrush", "pen", "pencil", "plate", "pot", "road_pole",
    "screwdriver", "toothbrush", "trash_bin", "trophy",
]

OBJECTNET3D_TEST_CATS = [
    "bed", "bookshelf", "calculator", "cellphone", "computer", "door",
    "filing_cabinet", "guitar", "iron", "knife", "microwave", "pen", "pot",
    "rifle", "shoe", "slipper", "stove", "toilet", "tub", "wheelchair",
]

PASCAL3D_TEST_CATS = [
    "aeroplane", "bicycle", "boat", "bottle", "bus", "car", "chair",
    "diningtable", "motorbike", "sofa", "train", "tvmonitor",
]

PIX3D_TEST_CATS = [
    "tool", "misc", "bookcase", "wardrobe", "desk", "bed", "table", "sofa", "chair",
]

LINEMOD_TEST_CATS = [1, 2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14, 15]


def pascal3d_frame(
    root_dir: str,
    annotation_file: str,
    train: bool = True,
    keypoint: bool = True,
    novel: bool = False,
    cat_choice: list[str] | None = None,
    train_cls: list[str] | str | None = None,
    shot: int | None = None,
    contrast_val_keypoint: bool = False,
    seed: int | None = None,
) -> pd.DataFrame:
    """Filter chain shared by Pascal3D and Pascal3DContrast.

    Set contrast_val_keypoint=True for the Pascal3DContrast val path which
    additionally requires has_keypoints == 1 (dataset.py:476).
    """
    frame = pd.read_csv(os.path.join(root_dir, annotation_file))
    frame = frame[frame.elevation != 90]
    frame = frame[frame.difficult == 0]
    if os.path.basename(annotation_file) == "ObjectNet3D.txt":
        if keypoint:
            frame = frame[frame.has_keypoints == 1]
            frame = frame[frame.truncated == 0]
            frame = frame[frame.occluded == 0]
        frame = frame.copy()
        frame.azimuth = (360.0 + frame.azimuth) % 360
    if train:
        frame = frame[frame.set == "train"]
    else:
        frame = frame[frame.set == "val"]
        frame = frame[frame.truncated == 0]
        frame = frame[frame.occluded == 0]
        if contrast_val_keypoint:
            frame = frame[frame.has_keypoints == 1]

    if cat_choice is not None:
        if train:
            frame = frame[~frame.cat.isin(cat_choice)] if novel else frame
        else:
            frame = frame[frame.cat.isin(cat_choice)]

    if train_cls is not None:
        if isinstance(train_cls, list):
            frame = frame[frame.cat.isin(train_cls)]
        else:
            frame = frame[frame.cat == train_cls]

    if train and shot is not None:
        rng = np.random.RandomState(seed)
        parts = []
        for cls in np.unique(frame.cat):
            parts.append(frame[frame.cat == cls].sample(n=shot, random_state=rng))
        frame = pd.concat(parts)

    return frame.reset_index(drop=True)


def pix3d_frame(
    root_dir: str, annotation_file: str, cat_choice: list | None = None
) -> pd.DataFrame:
    """Pix3D eval loader filters + label unit conversion (dataset.py:636-644)."""
    frame = pd.read_csv(os.path.join(root_dir, annotation_file))
    frame = frame[frame.truncated == False]  # noqa: E712  (stored as bools)
    frame = frame[frame.occluded == False]  # noqa: E712
    frame = frame[frame.slightly_occluded == False]  # noqa: E712
    frame = frame.copy()
    frame.elevation = frame.elevation + 90.0
    frame.inplane_rotation = (frame.inplane_rotation * 180.0 / np.pi) + 180.0
    if cat_choice is not None:
        frame = frame[frame.cat_id.isin(cat_choice)]
    return frame.reset_index(drop=True)


def pix3d_contrast_frame(
    root_dir: str,
    annotation_file: str,
    train: bool = True,
    train_feat: bool = False,
    cls_choice: list[str] | None = None,
    train_cls: list[str] | str | None = None,
    shot: int | None = None,
    idx_choice: np.ndarray | None = None,
    seed: int | None = None,
) -> pd.DataFrame:
    """Pix3DContrast filters (dataset.py:763-801)."""
    frame = pd.read_csv(os.path.join(root_dir, annotation_file))
    frame = frame[frame.elevation != 90]
    frame = frame[frame.difficult == 0]
    if "ObjectNet3D" in annotation_file:
        frame = frame.copy()
        frame.azimuth = (360.0 + frame.azimuth) % 360
    if train or train_feat:
        frame = frame[frame.set == "train"]
    else:
        frame = frame[frame.set == "val"]
        frame = frame[frame.truncated == 0]
        frame = frame[frame.occluded == 0]
        frame = frame[frame.has_keypoints == 1]

    if cls_choice is not None:
        frame = (
            frame[~frame.cls_name.isin(cls_choice)]
            if train
            else frame[frame.cls_name.isin(cls_choice)]
        )
    if train_cls is not None:
        if isinstance(train_cls, list):
            frame = frame[frame.cls_name.isin(train_cls)]
        else:
            frame = frame[frame.cls_name == train_cls]
    if train and shot is not None:
        rng = np.random.RandomState(seed)
        parts = []
        for cls in np.unique(frame.cls_name):
            parts.append(frame[frame.cls_name == cls].sample(n=shot, random_state=rng))
        frame = pd.concat(parts)
    if train and idx_choice is not None:
        frame = frame.iloc[idx_choice, :]
    return frame.reset_index(drop=True)


def linemod_frame(
    root_dir: str, annotation_file: str, cat_choice: list[int] | None = None
) -> pd.DataFrame:
    frame = pd.read_csv(os.path.join(root_dir, annotation_file))
    if cat_choice is not None:
        frame = frame[frame.obj_id.isin(cat_choice)]
    return frame.reset_index(drop=True)


def shapenet_frame(
    root_dir: str,
    annotation_file: str,
    train: bool = True,
    novel: bool = False,
    cat_choice: list | None = None,
    model_number: int = 200,
) -> pd.DataFrame:
    """ShapeNet synthetic frame with the per-category model cap
    (dataset.py:324-340)."""
    frame = pd.read_csv(os.path.join(root_dir, annotation_file))
    if cat_choice is not None:
        if train:
            frame = frame[~frame.cat_id.isin(cat_choice)] if novel else frame
        else:
            frame = frame[frame.cat_id.isin(cat_choice)]
    parts = []
    for cat in np.unique(frame.cat_id):
        frame_cat = frame[frame.cat_id == cat]
        examples = list(np.unique(frame_cat.example_id))[:model_number]
        parts.append(frame_cat[frame_cat.example_id.isin(examples)])
    frame = pd.concat(parts) if parts else frame
    return frame.reset_index(drop=True)
