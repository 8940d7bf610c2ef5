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

from pose3d_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    IMAGENET_PCA_EIGVAL,
    IMAGENET_PCA_EIGVEC,
)

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


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
