"""Device-side image augmentation (TPU-first host-bottleneck fix).

The measured host input pipeline tops out ~52 samples/s (docs/PERF.md)
because the per-sample numpy augmentations hold the GIL. Everything after
the geometric PIL ops is elementwise math — exactly what the TPU's VPU eats
for free inside the train step. With `--device_augment` the loader emits raw
float [0,1] pixels (PIL decode/crop/resize only, which release the GIL) and
the jit'd step applies:

  * ColorJitter(brightness/contrast/saturation 0.5) with RandomApply p=0.8
    (reference dataset.py:500-506; factors per image; fixed B->C->S order —
    the reference randomizes the order per sample, a statistically
    negligible deviation, documented here)
  * RandomGrayscale p=0.2
  * ImageNet normalize
  * PCA lighting noise (TransLightning alphastd=0.1, dataset.py:16-31)

Semantics match pose3d_tpu.data.transforms' host versions (A/B-tested in
tests/test_ops.py); only the RNG stream differs (statistical parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    IMAGENET_PCA_EIGVAL,
    IMAGENET_PCA_EIGVEC,
)

# numpy, NOT jnp: this module is lazily imported INSIDE jit-traced step
# functions (train/steps.py loss_fn), and a module-level jnp constant
# created during tracing is a tracer that leaks into module state and
# poisons every later trace (UnexpectedTracerError — caught by the full
# suite's e2e-before-test_ops ordering).
def dewire(im: jnp.ndarray) -> jnp.ndarray:
    """uint8 wire format -> the host's exact float [0,1] pixels.

    Raw (host_augment=False / device_views) batches cross the host->device
    boundary as uint8 — 4x fewer bytes on the transfer that dominates
    sustained training through the tunnel (docs/PERF.md round 4: 27.7 MB f32
    image batch = 728 ms vs the 70.7 ms device step). Matches
    data.transforms.to_float_array (np.asarray(im, f32)/255.0) to within
    1 ULP over all 256 values (XLA strength-reduces the division to a
    reciprocal multiply; max |delta| = 2^-24 — pinned in
    test_u8_wire_dewire_1ulp). Exact equality is unattainable without a
    256-entry gather, and no consumer can tell: raw pixels feed the device
    photometric augs + normalize next. f32 batches pass through untouched,
    so every step accepts both wire formats."""
    if im.dtype == jnp.uint8:
        return im.astype(jnp.float32) / jnp.float32(255.0)
    return im


_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def _grayscale(x):
    g = jnp.einsum("...c,c->...", x, _LUMA.astype(x.dtype))
    return g[..., None] * jnp.ones((3,), x.dtype)


def device_augment(
    images: jnp.ndarray,
    rng: jax.Array,
    jitter: float = 0.5,
    jitter_p: float = 0.8,
    grayscale_p: float = 0.2,
    pca_std: float = 0.1,
) -> jnp.ndarray:
    """(N, H, W, 3) float [0,1] raw pixels -> normalized augmented images."""
    n = images.shape[0]
    k_apply, k_b, k_c, k_s, k_gray, k_pca = jax.random.split(rng, 6)
    x = images.astype(jnp.float32)

    # per-image jitter factors in [1-j, 1+j]
    def factors(k):
        return jax.random.uniform(k, (n, 1, 1, 1), minval=1.0 - jitter,
                                  maxval=1.0 + jitter)

    apply = (jax.random.uniform(k_apply, (n, 1, 1, 1)) < jitter_p)
    fb, fc, fs = factors(k_b), factors(k_c), factors(k_s)

    jittered = x * fb
    mean_gray = jnp.mean(_grayscale(jittered)[..., :1], axis=(1, 2, 3),
                         keepdims=True)
    jittered = fc * jittered + (1.0 - fc) * mean_gray
    jittered = fs * jittered + (1.0 - fs) * _grayscale(jittered)
    jittered = jnp.clip(jittered, 0.0, 1.0)
    x = jnp.where(apply, jittered, x)

    gray_mask = (jax.random.uniform(k_gray, (n, 1, 1, 1)) < grayscale_p)
    x = jnp.where(gray_mask, _grayscale(x), x)

    x = (x - IMAGENET_MEAN) / IMAGENET_STD

    alpha = pca_std * jax.random.normal(k_pca, (n, 3))
    rgb = jnp.einsum("kc,nc->nk", IMAGENET_PCA_EIGVEC * IMAGENET_PCA_EIGVAL[None, :],
                     alpha)
    return (x + rgb[:, None, None, :]).astype(images.dtype)


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Eval-path equivalent: just the ImageNet normalize."""
    return ((images.astype(jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD).astype(
        images.dtype)


# --------------------------------------------------------------------------
# On-device 3-view synthesis (--device_views): the KD contrast views
# (base_class.py:350-355 concat; views built in dataset.py:556-573) derived
# from ONE host-decoded crop — the host does decode+crop+resize_pad once
# instead of three times, the only algorithmic answer to the single-core
# loader wall (docs/PERF.md).
# --------------------------------------------------------------------------


def _rotation_index_grid(h: int, w: int, angle_deg: float):
    """Static nearest-neighbor gather indices reproducing PIL
    Image.rotate(angle) (default resample=NEAREST, expand=False, fill=0):
    inverse-rotate output pixel centers (x+0.5, y+0.5) about the (w/2, h/2)
    center and floor. Measured vs PIL: 100% bit-equal at 64x64, >=99.9% at
    224x224 (the residual pixels are source coords within ~2e-4 of an integer
    — nearest-neighbor rounding ties in PIL's C loop). Returns
    (flat_idx (h*w,), valid (h*w,)) as numpy — baked into the jaxpr as
    constants."""
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    ys, xs = np.mgrid[0:h, 0:w]
    xo = xs + 0.5 - w / 2.0
    yo = ys + 0.5 - h / 2.0
    sx = np.floor(c * xo - s * yo + w / 2.0).astype(np.int32)
    sy = np.floor(s * xo + c * yo + h / 2.0).astype(np.int32)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    flat = np.where(valid, sy * w + sx, 0).astype(np.int32)
    return flat.reshape(-1), valid.reshape(-1)


def rotate_views(images: jnp.ndarray, rot_sign: jnp.ndarray,
                 angle_deg: float = 15.0) -> jnp.ndarray:
    """Per-sample +-angle rotation of (N, H, W, C) images, PIL-exact
    (nearest, black fill). `rot_sign` (N,) is +-1 — the host picks
    r = sign * 15 so the label algebra (transforms.rotate_label) stays
    host-side and exact. The two index grids are static constants; the
    per-sample select + one batched gather is all the device does."""
    n, h, w, ch = images.shape
    idx_p, val_p = _rotation_index_grid(h, w, angle_deg)
    idx_m, val_m = _rotation_index_grid(h, w, -angle_deg)
    pos = (rot_sign > 0)[:, None]
    idx = jnp.where(pos, jnp.asarray(idx_p)[None, :], jnp.asarray(idx_m)[None, :])
    valid = jnp.where(pos, jnp.asarray(val_p)[None, :], jnp.asarray(val_m)[None, :])
    flat = images.reshape(n, h * w, ch)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    out = jnp.where(valid[..., None], out, jnp.zeros((), images.dtype))
    return out.reshape(n, h, w, ch)


def synthesize_views(images: jnp.ndarray, rot_sign: jnp.ndarray,
                     angle_deg: float = 15.0) -> jnp.ndarray:
    """Base view (N, H, W, C) -> concatenated 3N views [base | flip | rot]
    in the reference's concat order (base_class.py:350-355).

    Flip is an exact W-axis mirror of the padded canvas (equals the host's
    flip-then-letterbox when the letterbox padding splits evenly; off by a
    1-px translation otherwise — see datasets.Pascal3DContrast docstring).
    Rotation happens on the padded canvas rather than the pre-resize crop
    (scale/rotation commute; the canvas keeps strictly more corner content) —
    deliberate TPU-first deviation, PIL-bit-exact per canvas."""
    flip = images[:, :, ::-1, :]
    rot = rotate_views(images, rot_sign, angle_deg)
    return jnp.concatenate([images, flip, rot], axis=0)
