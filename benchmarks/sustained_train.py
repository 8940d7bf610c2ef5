"""Sustained KD training throughput through the REAL trainer path.

Every KD step number in docs/PERF.md uses device-resident batches; this
script answers VERDICT r3 weak #6: drive `cli.trainingKD --crd` end-to-end
(shm loader + --device_views + Prefetcher + per-step metric sync) for
multiple epochs on the chip and report ACHIEVED train samples/s against the
two ceilings that bound it:

  - device ceiling:  the KD step rate (651 samples/s median-of-7, PERF.md)
  - host ceiling:    the loader-only rate, measured here on the SAME fixture
                     (sandbox host has 1 core -> this is the binding wall)

Overlap diagnosis from the three numbers:
  sustained ~= min(host, device)            -> pipeline overlaps (good)
  sustained ~= 1/(1/host + 1/device)        -> fully serialized (stall)
anything between quantifies the partial stall.

Match workload: /root/reference/trainingKD.py:202-205 (the epoch loop whose
torch DataLoader + CUDA step is the reference's sustained path).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/sustained_train.py
  ... [--quick] [--epochs 5] [--n_per_cat 300] [--profile_dir DIR]

Writes per-epoch JSON lines + a one-line summary; results go to
docs/PERF.md "sustained training".
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/sustained_train"


def build_fixture(n_per_cat: int) -> str:
    """Same realistic shapes as loader_bench.py: 400px source images,
    9000-vertex clouds, 224px crops, 2500-pt sampling."""
    from pose3d_tpu.data import synthetic

    data_root = os.path.join(WORK, "data")
    marker = os.path.join(data_root, f".fixture_{n_per_cat}")
    if not os.path.exists(marker):
        shutil.rmtree(data_root, ignore_errors=True)
        synthetic.make_objectnet3d_fixture(
            os.path.join(data_root, "ObjectNet3D"),
            categories=("bed", "chair", "sofa", "desk"),
            n_train_per_cat=n_per_cat, n_val_per_cat=2,
            image_size=400, n_vertices=9000,
        )
        open(marker, "w").close()
    return data_root


def loader_only_rate(data_root: str, bs: int, workers: int,
                     timed_batches: int, cache_mb: float = 0.0,
                     loader: str = "shm", device_shapes: bool = False) -> float:
    """Host ceiling: shm loader alone on the same fixture, no device.

    With cache_mb > 0 the 3 warm batches under-represent the steady-state
    rate (the per-worker cache ramps as 1-((W-1)/W)^epoch); the timed window
    spans multiple epochs, so the reported number is the ramping average —
    the matching trainingKD run below sees the same ramp per-epoch."""
    from pose3d_tpu.data import datasets, shm_loader

    ds = datasets.Pascal3DContrast(
        os.path.join(data_root, "ObjectNet3D"), "ObjectNet3D.txt", train=True,
        shape="PointCloud", shape_dir="pointcloud", point_num=2500,
        input_dim=224, device_views=True, decode_cache_mb=cache_mb,
        device_shapes=device_shapes)
    if loader == "thread":
        from pose3d_tpu.data.loader import DataLoader

        dl = DataLoader(ds, bs, shuffle=True, num_workers=workers)
    else:
        dl = shm_loader.ShmDataLoader(ds, bs, shuffle=True, num_workers=workers)
    try:
        def epochs():
            e = 0
            while True:
                dl.set_epoch(e)
                yield from dl
                e += 1

        it = epochs()
        for _ in range(3):  # warm: workers up, queues primed
            next(it)
        t0 = time.perf_counter()
        for _ in range(timed_batches):
            next(it)
        return timed_batches * bs / (time.perf_counter() - t0)
    finally:
        dl.close()


def run_cli(data_root: str, bs: int, workers: int, epochs: int,
            profile_dir: str | None, cache_mb: float = 0.0,
            loader: str = "shm", device_shapes: bool = False) -> str:
    result_dir = os.path.join(WORK, "result")
    shutil.rmtree(result_dir, ignore_errors=True)
    cmd = [sys.executable, "-m", "pose3d_tpu.cli.trainingKD",
           "--crd", "--tau", "0.5",
           "--dataset", "ObjectNet3D", "--data_root", data_root,
           "--shape", "PointCloud", "--shape_dir", "pointcloud",
           "--batch_size", str(bs), "--workers", str(workers),
           "--loader", loader, "--device_views",
           "--n_epoch", str(epochs), "--decrease", str(epochs),
           "--result_dir", result_dir]
    if cache_mb:
        cmd += ["--cache_decoded_mb", str(cache_mb)]
    if device_shapes:
        cmd += ["--device_shapes"]
    if profile_dir:
        cmd += ["--profile_dir", profile_dir]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=WORK, env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        raise SystemExit(f"trainingKD failed rc={proc.returncode}")
    print(f"CLI wall {time.time() - t0:.0f}s", flush=True)
    return os.path.join(result_dir, "KD_ObjectNet3D", "metrics.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n_per_cat", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=46)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--device_ceiling", type=float, default=651.1,
                    help="KD device-step samples/s (PERF.md median-of-7)")
    ap.add_argument("--profile_dir", type=str, default=None)
    ap.add_argument("--skip_loader", action="store_true",
                    help="reuse a known host-ceiling number instead of "
                         "re-measuring (pass --host_ceiling)")
    ap.add_argument("--host_ceiling", type=float, default=None)
    ap.add_argument("--cache_mb", type=float, default=0.0,
                    help="decoded-image cache budget per worker "
                         "(--cache_decoded_mb); epochs >= 2 skip decode")
    ap.add_argument("--loader", type=str, default="shm",
                    choices=["thread", "shm"],
                    help="loader backend; with --cache_mb the thread "
                         "loader's ONE shared cache hits fully from epoch 2 "
                         "while shm workers each ramp their own")
    ap.add_argument("--device_shapes", action="store_true",
                    help="device-resident cloud bank (ops/shape_bank.py): "
                         "3 scalars/sample on the wire instead of the cloud")
    args = ap.parse_args()
    if args.quick:
        args.epochs, args.n_per_cat = 3, 120

    os.makedirs(WORK, exist_ok=True)
    data_root = build_fixture(args.n_per_cat)
    n_train = 4 * args.n_per_cat

    if args.host_ceiling is not None:
        host = args.host_ceiling
    else:
        host = loader_only_rate(data_root, args.batch_size, args.workers,
                                timed_batches=max(6, n_train // args.batch_size),
                                cache_mb=args.cache_mb, loader=args.loader,
                                device_shapes=args.device_shapes)
    print(json.dumps({"metric": "loader_only_samples_per_s",
                      "value": round(host, 1), "workers": args.workers,
                      "device_views": True, "cache_mb": args.cache_mb,
                      "loader": args.loader,
                      "device_shapes": args.device_shapes}), flush=True)

    metrics_path = run_cli(data_root, args.batch_size, args.workers,
                           args.epochs, args.profile_dir, cache_mb=args.cache_mb,
                           loader=args.loader, device_shapes=args.device_shapes)

    rows = [json.loads(l) for l in open(metrics_path)]
    epoch_rows = [r for r in rows if r.get("kind") == "crd_epoch"]
    for r in epoch_rows:
        print(json.dumps({"metric": "sustained_epoch",
                          "epoch": r["epoch"],
                          "train_samples_per_s": r["train_samples_per_s"],
                          "train_seconds": r["train_seconds"],
                          "train_samples": r["train_samples"]}), flush=True)

    # steady state = every epoch after the compile epoch
    steady = [r["train_samples_per_s"] for r in epoch_rows[1:]] or \
             [epoch_rows[0]["train_samples_per_s"]]
    sustained = float(np.median(steady))
    dev = args.device_ceiling
    overlapped = min(host, dev)
    serialized = 1.0 / (1.0 / host + 1.0 / dev)
    # 1.0 -> perfect overlap, 0.0 -> fully serialized
    overlap_frac = (sustained - serialized) / max(overlapped - serialized, 1e-9)
    print(json.dumps({
        "metric": "sustained_train_samples_per_s",
        "value": round(sustained, 1),
        "host_ceiling": round(host, 1),
        "device_ceiling": dev,
        "perfect_overlap": round(overlapped, 1),
        "fully_serialized": round(serialized, 1),
        "overlap_fraction": round(float(overlap_frac), 3),
        "epochs_measured": len(steady),
    }), flush=True)


if __name__ == "__main__":
    main()
