"""On-chip A/B: host shape loading vs the device-resident shape/render bank.

Measures the MultiView teacher's TRAIN and EVAL loops with shapes produced
the reference way (per-sample host render decode + a (K, H, W, 3) f32 wire
transfer — reference dataset.py render branch) against `--device_shapes`
(ops/shape_bank.py: u8 render bank in HBM, 2 scalars on the wire, flat
id-table gather in-step). Both modes run interleaved in ONE process so they
share chip/tunnel conditions; losses must agree (mutation=0 renders are
deterministic, so the teacher inputs match to the 1-ULP dewire delta).

Measured 2026-08-19 (docs/PERF.md round 4): eval 4.4-4.7 -> 53-67
samples/s (~14x), train 3.7 -> 37.8-44.1 samples/s (~10-12x), identical
predictions / loss.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shape_bank_ab.py
  ... [--n_per_cat 60] [--batch_size 16] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

WORK = "/tmp/shape_bank_ab"


def build_fixture(n_per_cat: int) -> str:
    from pose3d_tpu.data import synthetic

    root = os.path.join(WORK, "data", "ObjectNet3D")
    marker = os.path.join(WORK, f".fixture_{n_per_cat}")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(os.path.join(WORK, "data"), ignore_errors=True)
        synthetic.make_objectnet3d_fixture(
            root, categories=("bed", "chair"), n_train_per_cat=n_per_cat,
            n_val_per_cat=n_per_cat, image_size=256, with_renders=True,
            n_renders=144, render_size=224)
        open(marker, "w").close()
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_per_cat", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=2,
                    help="per mode; the LAST epoch wall is the steady number")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pose3d_tpu.data import datasets
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models.estimators import PoseEstimator
    from pose3d_tpu.ops import shape_bank as sb
    from pose3d_tpu.train import steps
    from pose3d_tpu.train.state import create_train_state, torch_style_adam
    from pose3d_tpu.train.trainer import device_batch

    root = build_fixture(args.n_per_cat)
    teacher = PoseEstimator(shape="MultiView", view_num=12,
                            img_feature_dim=256, shape_feature_dim=64,
                            dtype=jnp.bfloat16)

    def dataset(train, device_shapes):
        return datasets.Pascal3DContrast(
            root, "ObjectNet3D.txt", train=train, shape="MultiView",
            shape_dir="Renders_semi_sphere", view_num=12, tour=2,
            input_dim=224, seed=46, device_shapes=device_shapes)

    renders, id_table = dataset(True, True).build_render_bank()
    bank = jax.device_put(sb.RenderBank.from_arrays(renders, id_table))
    print(json.dumps({"bank_models": int(renders.shape[0]),
                      "bank_mb_u8": round(renders.nbytes / (1 << 20), 1)}),
          flush=True)

    im_ex = (jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 12, 224, 224, 3)))
    variables = teacher.init(jax.random.key(0), *im_ex, train=False)
    train_h = jax.jit(steps.make_teacher_train_step(teacher),
                      donate_argnums=(0,))
    train_b = jax.jit(steps.make_teacher_train_step(teacher,
                                                    with_shape_bank=True),
                      donate_argnums=(1,))
    eval_h = jax.jit(steps.make_eval_step(teacher, "teacher"))
    eval_b = jax.jit(steps.make_eval_step(teacher, "teacher",
                                          with_shape_bank=True))

    def sweep(kind, with_bank):
        train = kind == "train"
        keys = (("im", "label") +
                (("shape_id", "shape_mut") if with_bank else ("shape",)))
        ds = dataset(train, with_bank)
        dl = DataLoader(ds, args.batch_size, shuffle=train, num_workers=4)
        state = create_train_state(teacher, im_ex, jax.random.key(0),
                                   torch_style_adam(1e-4, 5e-4)) if train else None
        walls, n, probe = [], 0, None
        for e in range(args.epochs):
            dl.set_epoch(e)
            t0 = time.perf_counter()
            n = 0
            for b in dl:
                host = {k: b[k] for k in keys if k in b}
                db, hv = device_batch(host, b.get("valid"), None)
                if train:
                    a = (bank, state, db) if with_bank else (state, db)
                    state, m = (train_b if with_bank else train_h)(*a)
                    probe = m["loss"]
                else:
                    a = (bank, variables, db) if with_bank else (variables, db)
                    m = (eval_b if with_bank else eval_h)(*a)
                    probe = m["loss"]
                n += int(hv.sum())
            np.asarray(probe)  # sync
            walls.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": "shape_bank_ab", "kind": kind,
            "mode": "bank" if with_bank else "host",
            "epoch_walls_s": [round(w, 1) for w in walls],
            "steady_samples_per_s": round(n / walls[-1], 1),
            "last_loss": round(float(np.asarray(probe)), 4)}), flush=True)

    # interleaved: each mode sees comparable chip/tunnel conditions
    for kind in ("eval", "train"):
        sweep(kind, with_bank=True)   # warm the bank graphs first
        sweep(kind, with_bank=False)
        sweep(kind, with_bank=True)


if __name__ == "__main__":
    main()
