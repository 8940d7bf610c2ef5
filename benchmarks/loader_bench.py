"""Host input-pipeline throughput: thread DataLoader vs ShmDataLoader.

Builds a synthetic ObjectNet3D-style fixture with realistic shapes (full-size
source images, 224px crops, 2500-pt clouds, 3 contrast views) and measures
steady-state samples/s for each loader configuration. The KD device step
consumes ~523 samples/s (docs/PERF.md); the loader must exceed that.

Usage: python benchmarks/loader_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

from pose3d_tpu.data import datasets, loader, shm_loader, synthetic


def _epochs(dl):
    epoch = 0
    while True:
        dl.set_epoch(epoch)
        yield from dl
        epoch += 1


def measure(dl, warm_batches: int, timed_batches: int, bs: int) -> float:
    it = _epochs(dl)
    for _ in range(warm_batches):
        next(it)
    t0 = time.perf_counter()
    for _ in range(timed_batches):
        next(it)
    dt = time.perf_counter() - t0
    return timed_batches * bs / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch_size", type=int, default=46)
    ap.add_argument("--host_augment", type=int, default=1)
    ap.add_argument("--device_views", action="store_true",
                    help="emit ONE raw view per sample (flip/rot synthesized "
                         "on-device) — the --device_views loader workload")
    args = ap.parse_args()

    n_per_cat = 60 if args.quick else 150
    warm, timed = (2, 6) if args.quick else (6, 24)

    with tempfile.TemporaryDirectory() as root:
        synthetic.make_objectnet3d_fixture(
            root, categories=("bed", "chair", "sofa", "desk"),
            n_train_per_cat=n_per_cat, n_val_per_cat=2,
            image_size=400, n_vertices=9000,
        )
        ds = datasets.Pascal3DContrast(
            root, "ObjectNet3D.txt", train=True, shape="PointCloud",
            shape_dir="pointcloud", point_num=2500, input_dim=224,
            host_augment=bool(args.host_augment),
            device_views=args.device_views,
        )
        print(f"dataset: {len(ds)} samples, host_augment={bool(args.host_augment)}, "
              f"device_views={args.device_views}, bs={args.batch_size}")

        configs = [
            ("sync", lambda: loader.DataLoader(
                ds, args.batch_size, shuffle=True, num_workers=0)),
            ("thread x8", lambda: loader.DataLoader(
                ds, args.batch_size, shuffle=True, num_workers=8)),
            ("shm-proc x1", lambda: shm_loader.ShmDataLoader(
                ds, args.batch_size, shuffle=True, num_workers=1)),
            ("shm-proc x4", lambda: shm_loader.ShmDataLoader(
                ds, args.batch_size, shuffle=True, num_workers=4)),
            ("shm-proc x8", lambda: shm_loader.ShmDataLoader(
                ds, args.batch_size, shuffle=True, num_workers=8)),
        ]
        n_cpu = os.cpu_count()
        print(f"host cores: {n_cpu} (process workers scale with cores; "
              f"on 1 core every loader is capped at the sync rate)")
        for name, make in configs:
            dl = make()
            try:
                rate = measure(dl, warm, timed, args.batch_size)
                print(f"{name:24s} {rate:8.1f} samples/s", flush=True)
            finally:
                if hasattr(dl, "close"):
                    dl.close()


if __name__ == "__main__":
    main()
