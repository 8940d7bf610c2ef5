"""Feature-space visualization CLIs.

Capability parity with the reference visualization tools (SURVEY.md §2 #25):
  * vis_tSNE.py (1-267): student 200-d features -> PCA-50 -> t-SNE scatter
    colored by the azimuth angle bin.
  * vis_contrastive.py (1-220): teacher fused features and image-projector
    features embedded in ONE t-SNE space to inspect the contrastive
    alignment.

Improvements over the reference: no hard-coded absolute paths
(vis_tSNE.py:55), features are extracted with the jit'd eval path, output is
a .png + a .npz of the raw embeddings for downstream analysis.

Usage:
  python -m pose3d_tpu.cli.vis_tsne --mode student --model <ckpt> \
      --dataset ObjectNet3D --data_root data --out tsne.png
  python -m pose3d_tpu.cli.vis_tsne --mode contrastive --model <teacher_ckpt> \
      --shape PointCloud --shape_dir pointcloud ...
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.cli import common
from pose3d_tpu.data.loader import DataLoader


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument("--mode", choices=["student", "contrastive"],
                        default="student")
    parser.add_argument("--out", type=str, default="tsne.png")
    parser.add_argument("--max_samples", type=int, default=2000)
    parser.add_argument("--perplexity", type=float, default=30.0)
    parser.add_argument("--bin_color", type=int, default=0,
                        help="which angle (0=azi,1=ele,2=inp) colors the scatter")
    parser.add_argument("--n_components", type=int, default=2, choices=[2, 3],
                        help="t-SNE dims (the reference vis_tSNE uses 3)")
    opt = parser.parse_args(argv)
    common.normalize_shape(opt)
    return opt


def extract_features(opt):
    """Run the eval set through the model, returning (features dict, labels)."""
    from pose3d_tpu.cli.testing import build_eval_dataset

    dataset = build_eval_dataset(opt)
    loader = DataLoader(dataset, opt.batch_size, shuffle=False,
                        num_workers=opt.workers)

    if opt.mode == "student":
        model = common.build_student(opt, img_feature_dim=opt.img_feature_dim)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),
                               train=False)
        if opt.model:
            from pose3d_tpu.cli.trainingKD import _load_ckpt_into

            variables = _load_ckpt_into(variables, opt.model)

        @jax.jit
        def fwd(v, im):
            _, proj = model.apply(v, im, train=False)
            return proj

        feats, labels = [], []
        for b in loader:
            valid = b["valid"]
            feats.append(np.asarray(fwd(variables, jnp.asarray(b["im"])))[valid])
            labels.append(b["label"][valid])
        return {"student": np.concatenate(feats)}, np.concatenate(labels)

    # contrastive mode: teacher fused + image-projector features
    model = common.build_teacher(opt)
    if opt.shape == "PointCloud":
        shape_ex = jnp.zeros((1, opt.point_num, 3))
    else:
        shape_ex = jnp.zeros((1, opt.view_num, opt.input_dim, opt.input_dim, 3))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),
                           shape_ex, train=False)
    if opt.model:
        from pose3d_tpu.cli.trainingKD import _load_ckpt_into

        variables = _load_ckpt_into(variables, opt.model)

    @jax.jit
    def fwd(v, im, shape):
        _, fused, proj = model.apply(v, im, shape, train=False)
        return fused, proj

    fused_all, proj_all, labels = [], [], []
    for b in loader:
        valid = b["valid"]
        fused, proj = fwd(variables, jnp.asarray(b["im"]), jnp.asarray(b["shape"]))
        fused_all.append(np.asarray(fused)[valid])
        proj_all.append(np.asarray(proj)[valid])
        labels.append(b["label"][valid])
    return ({"fused": np.concatenate(fused_all), "projector": np.concatenate(proj_all)},
            np.concatenate(labels))


def run_tsne(features: dict[str, np.ndarray], labels: np.ndarray, opt):
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    names = list(features)
    stacked = np.concatenate([features[n] for n in names])
    if stacked.shape[0] > opt.max_samples * len(names):
        keep = np.random.default_rng(0).choice(
            features[names[0]].shape[0],
            min(opt.max_samples, features[names[0]].shape[0]), replace=False)
        stacked = np.concatenate([features[n][keep] for n in names])
        labels = labels[keep]

    n_pca = min(50, stacked.shape[0], stacked.shape[1])
    if stacked.shape[1] > n_pca:
        stacked = PCA(n_components=n_pca).fit_transform(stacked)
    emb = TSNE(n_components=opt.n_components,
               perplexity=min(opt.perplexity, max(2, len(stacked) // 4)),
               init="pca", random_state=0).fit_transform(stacked)

    per = emb.shape[0] // len(names)
    out = {n: emb[i * per:(i + 1) * per] for i, n in enumerate(names)}
    return out, labels


def main(argv=None):
    opt = parse_args(argv)
    features, labels = extract_features(opt)
    embeddings, labels = run_tsne(features, labels, opt)

    np.savez(os.path.splitext(opt.out)[0] + ".npz", labels=labels,
             **{f"emb_{k}": v for k, v in embeddings.items()},
             **{f"feat_{k}": v for k, v in features.items()})
    try:
        import matplotlib

        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        if opt.n_components == 3:
            fig = plt.figure(figsize=(8, 8))
            ax = fig.add_subplot(projection="3d")
        else:
            fig, ax = plt.subplots(figsize=(8, 8))
        markers = {0: "o", 1: "^"}
        for i, (name, emb) in enumerate(embeddings.items()):
            colors = (labels[: len(emb), opt.bin_color] // 15).astype(int)
            coords = (emb[:, 0], emb[:, 1]) if opt.n_components == 2 else (
                emb[:, 0], emb[:, 1], emb[:, 2])
            sc = ax.scatter(*coords, c=colors, cmap="hsv", s=8,
                            marker=markers.get(i, "o"), label=name, alpha=0.7)
        ax.legend()
        fig.colorbar(sc, ax=ax, label=["azimuth", "elevation", "inplane"][opt.bin_color]
                     + " bin")
        fig.savefig(opt.out, dpi=150)
        print(f"wrote {opt.out}")
    except Exception as e:  # matplotlib optional
        print(f"plot skipped ({e}); embeddings saved to .npz")
    return embeddings, labels


if __name__ == "__main__":
    main()
