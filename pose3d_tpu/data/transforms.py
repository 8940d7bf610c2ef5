"""Host-side image/point-cloud transforms (numpy + PIL; device code never
sees variable shapes — every pipeline emits fixed (H, W, 3) / (P, 3)).

Capability parity with /root/reference/auxiliary/dataset.py:16-150:
  * pca_lighting      — TransLightning(0.1, imagenet eigval/eigvec) (16-41)
  * normalize_image   — ImageNet mean/std (44-46)
  * random_crop       — IoU-jittered bbox crop (50-56)
  * resize_pad        — aspect-preserving resize + center pad (59-67)
  * resize_padding    — paste-on-black variant (70-81)
  * color_jitter      — torchvision ColorJitter(0.5, 0.5, 0.5) semantics
  * random_grayscale  — p=0.2 grayscale with 3-channel replication
  * multiview_ids     — azimuth-ring index arithmetic incl. `mutation`
                        rotation of the canonical frame (84-108)
  * sample_pointcloud — random 2500-pt subset, z-rotation, min-max normalize
                        to [0, 1] (121-150)
Label algebra (canonicalization / flip / rotate fixes) lives here too so it
can be golden-tested as pure functions (dataset.py:250-273, 556-573).
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image, ImageFilter

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

IMAGENET_PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
IMAGENET_PCA_EIGVEC = np.array(
    [[-0.5675, 0.7192, 0.4009],
     [-0.5808, -0.0045, -0.8140],
     [-0.5836, -0.6948, 0.4203]], np.float32
)


# --------------------------------------------------------------------------
# image ops (PIL in, PIL or numpy out)
# --------------------------------------------------------------------------
def random_crop(im: Image.Image, x, y, w, h, rng: np.random.Generator) -> Image.Image:
    """Crop with up to +-10% bbox jitter (IoU >= 0.7), dataset.py:50-56."""
    left = max(0, x + int(rng.uniform(-0.1, 0.1) * w))
    upper = max(0, y + int(rng.uniform(-0.1, 0.1) * h))
    right = min(im.size[0], x + int(rng.uniform(0.9, 1.1) * w))
    lower = min(im.size[1], y + int(rng.uniform(0.9, 1.1) * h))
    return im.crop((left, upper, right, lower))


def resize_pad(im: Image.Image, dim: int) -> Image.Image:
    """Aspect-preserving resize of the longest side to `dim`, center-padded
    (dataset.py:59-67)."""
    w, h = im.size
    if max(w, h) == 0:
        return Image.new(im.mode, (dim, dim))
    # torchvision F.resize(size=int) scales the SHORT side to int; the
    # reference passes int(dim * min/max) so the LONG side lands on dim
    target_short = int(dim * min(w, h) / max(w, h))
    scale = target_short / min(w, h) if min(w, h) else 1.0
    new_size = (max(1, round(w * scale)), max(1, round(h * scale)))
    im = im.resize(new_size, Image.BILINEAR)
    new_im = Image.new(im.mode if im.mode == "RGB" else "RGB", (dim, dim))
    new_im.paste(im, ((dim - new_size[0] + 1) // 2, (dim - new_size[1] + 1) // 2))
    return new_im


def resize_padding(im: Image.Image, desired_size: int) -> Image.Image:
    """Resize longest side to desired_size and paste on black square
    (dataset.py:70-81)."""
    old_size = im.size
    ratio = float(desired_size) / max(old_size)
    new_size = tuple(int(x * ratio) for x in old_size)
    im = im.resize(new_size, Image.BILINEAR)
    new_im = Image.new("RGB", (desired_size, desired_size))
    new_im.paste(im, ((desired_size - new_size[0]) // 2, (desired_size - new_size[1]) // 2))
    return new_im


def gaussian_blur(im: Image.Image, radius: float) -> Image.Image:
    return im.filter(ImageFilter.GaussianBlur(radius))


def color_jitter(
    arr: np.ndarray, rng: np.random.Generator,
    brightness: float = 0.5, contrast: float = 0.5, saturation: float = 0.5,
) -> np.ndarray:
    """torchvision ColorJitter semantics on a float [0,1] HWC array: each
    factor drawn uniform from [max(0, 1-v), 1+v], applied in random order."""
    ops = []
    if brightness:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda a: a * f)
    if contrast:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda a: _blend(a, _gray(a).mean(), f))
    if saturation:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda a: _blend(a, _gray(a)[..., None], f))
    order = rng.permutation(len(ops))
    for i in order:
        arr = ops[i](arr)
    return np.clip(arr, 0.0, 1.0)


def _gray(a: np.ndarray) -> np.ndarray:
    return a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114


def _blend(a, b, f):
    return f * a + (1.0 - f) * b


def random_grayscale(arr: np.ndarray, rng: np.random.Generator, p: float = 0.2) -> np.ndarray:
    if rng.random() < p:
        g = _gray(arr)
        arr = np.stack([g, g, g], axis=-1)
    return arr


def pca_lighting(arr: np.ndarray, rng: np.random.Generator, alphastd: float = 0.1) -> np.ndarray:
    """AlexNet-style PCA lighting noise in CHW-agnostic HWC form
    (dataset.py:16-31). `arr` is float HWC, already normalized or not."""
    if alphastd == 0:
        return arr
    alpha = rng.normal(0.0, alphastd, size=3).astype(np.float32)
    rgb = (IMAGENET_PCA_EIGVEC * alpha[None, :] * IMAGENET_PCA_EIGVAL[None, :]).sum(1)
    return arr + rgb[None, None, :]


def normalize_image(arr: np.ndarray) -> np.ndarray:
    """float [0,1] HWC -> ImageNet-normalized float32."""
    return ((arr - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def to_float_array(im: Image.Image) -> np.ndarray:
    return np.asarray(im, np.float32) / 255.0


# --------------------------------------------------------------------------
# multi-view render id arithmetic (dataset.py:84-108)
# --------------------------------------------------------------------------
def multiview_ids(view_num: int, tour: int, mutation: int) -> np.ndarray:
    """Indices into the sorted render-file list: `tour` elevation rings of 72
    azimuth steps, rolled by `mutation` then strided to view_num/tour views."""
    step = int(72 / (view_num / tour))
    low = np.arange(72, dtype=int)
    mid = low + 72
    up = mid + 72
    rolled = lambda r: np.concatenate((r[mutation:], r[:mutation]))[::step]
    if tour == 1:
        return rolled(mid)
    if tour == 2:
        return np.concatenate((rolled(low), rolled(mid)))
    return np.concatenate((rolled(low), rolled(mid), rolled(up)))


# --------------------------------------------------------------------------
# point cloud sampling (dataset.py:121-150)
# --------------------------------------------------------------------------
def sample_pointcloud(
    vertices: np.ndarray, point_num: int, rotation_deg: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Random fixed-size subset + z-rotation + min-max normalize to [0, 1].

    Returns channels-last (point_num, 3) float32 (the TPU layout; the
    reference returns (3, P) for torch Conv1d).
    """
    replace = vertices.shape[0] < point_num
    idx = rng.choice(vertices.shape[0], point_num, replace=replace)
    pts = vertices[idx].astype(np.float64)
    if rotation_deg != 0:
        a = math.radians(rotation_deg)
        rot = np.array([[np.cos(a), -np.sin(a), 0.0],
                        [np.sin(a), np.cos(a), 0.0],
                        [0.0, 0.0, 1.0]])
        pts = pts @ rot.T
    pts = pts - pts.min()
    m = pts.max()
    if m > 0:
        pts = pts / m
    return pts.astype(np.float32)


# --------------------------------------------------------------------------
# label algebra (pure, golden-tested)
# --------------------------------------------------------------------------
def process_viewpoint_label(label: np.ndarray, offset: float = 0.0) -> np.ndarray:
    """Annotation triple (azi, ele, inp) -> canonical int triple
    (dataset.py:428-434): azi=(360-azi+offset)%360, ele+=90, inp=(inp+180)%360."""
    label = np.asarray(label, np.float64).copy()
    label[0] = (360.0 - label[0] + offset) % 360.0
    label[1] = label[1] + 90.0
    label[2] = (label[2] + 180.0) % 360.0
    return label.astype(np.int64)


def flip_label(label: np.ndarray) -> np.ndarray:
    """Horizontal-flip fix on the RAW annotation triple (dataset.py:570-572):
    azi -> 360 - azi, inp -> -inp."""
    label = np.asarray(label, np.float64).copy()
    label[0] = 360.0 - label[0]
    label[2] = -label[2]
    return label


def rotate_label(label: np.ndarray, r_deg: float) -> np.ndarray:
    """In-plane rotation fix on the RAW annotation triple
    (dataset.py:561-563): inp += r, wrapped into (-180, 180]."""
    label = np.asarray(label, np.float64).copy()
    label[2] = label[2] + r_deg
    if label[2] < -180:
        label[2] += 360
    elif label[2] > 180:
        label[2] -= 360
    return label
