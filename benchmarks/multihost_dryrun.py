"""Two-process jax.distributed dryrun: per-host input sharding + cross-process
collectives on a CPU-emulated 2-host x 4-device topology.

The reference has no distributed execution at all (SURVEY.md §2c); this script
validates the multi-HOST half of the TPU-native parallel layer that the
single-process tests (virtual 8-device mesh) cannot reach:

  * jax.distributed.initialize over a real coordinator (gloo CPU collectives),
  * per-host dataset sharding (data/loader.py process_index::process_count),
  * jax.make_array_from_process_local_data assembling the global batch
    (parallel/mesh.shard_host_local_batch),
  * the full KD --crd train step jitted over the GLOBAL 8-device mesh: grad
    psum, global-batch feature-KL/NCE and sync-BN all cross the process
    boundary.

Run with no arguments: it spawns both worker processes, waits, and asserts the
two processes computed IDENTICAL losses (the collectives are global) that are
also finite and decreasing-capable. Exit code 0 = pass.

    python benchmarks/multihost_dryrun.py
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

LOCAL_DEVICES = 4
N_PROCESSES = 2
PORT = 29533
STEPS = 2


def worker(process_id: int, root: str, port: int) -> None:
    # env BEFORE importing jax: virtual local devices for this "host".
    # Drop any inherited device-count flag (e.g. from a pytest conftest) —
    # duplicated flags make the FIRST one win and break the topology.
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=N_PROCESSES, process_id=process_id)
    assert jax.process_count() == N_PROCESSES
    assert jax.device_count() == N_PROCESSES * LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np

    from pose3d_tpu.data import datasets
    from pose3d_tpu.data.loader import DataLoader
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.parallel import make_mesh, replicate, shard_host_local_batch
    from pose3d_tpu.train import create_train_state, torch_style_adam, steps

    # per-host loader: each process owns indices process_id::2 of the dataset
    ds = datasets.Pascal3DContrast(
        os.path.join(root, "ObjectNet3D"), "ObjectNet3D.txt", train=True,
        shape="PointCloud", shape_dir="pointcloud", input_dim=64,
        point_num=128, seed=46)
    per_host_bs = 4  # global batch 8 over 8 global devices
    loader = DataLoader(ds, batch_size=per_host_bs, shuffle=True, drop_last=True,
                        num_workers=0, seed=46)
    assert loader.process_index == process_id and loader.process_count == 2

    student = BaselineEstimator(img_feature_dim=64)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64)
    state = create_train_state(student, (jnp.zeros((1, 64, 64, 3)),),
                               jax.random.key(0), torch_style_adam(1e-4))
    t_vars = teacher.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 128, 3)), train=False)

    mesh = make_mesh(jax.devices())  # GLOBAL mesh across both processes
    state = replicate(state, mesh)
    t_vars = replicate(t_vars, mesh)
    step = jax.jit(steps.make_kd_crd_step(student, teacher), donate_argnums=(0,))

    keys = ("im", "shape", "label", "im_flip", "label_flip", "im_rot", "label_rot")
    losses = []
    it = iter(loader)
    for i in range(STEPS):
        b = next(it)
        local = {k: b[k] for k in keys}
        gb = shard_host_local_batch(local, mesh)
        assert gb["im"].shape[0] == per_host_bs * N_PROCESSES
        state, metrics = step(state, t_vars, gb)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    print(f"MULTIHOST_OK process={process_id} losses="
          + ",".join(f"{v:.6f}" for v in losses), flush=True)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def coordinator() -> int:
    root = tempfile.mkdtemp(prefix="pose3d_mh_")
    from pose3d_tpu.data import synthetic

    synthetic.make_objectnet3d_fixture(
        os.path.join(root, "ObjectNet3D"), categories=("bed", "chair"),
        n_train_per_cat=8, n_val_per_cat=2, image_size=72, n_vertices=200)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    # force the CPU platform even when the axon TPU plugin is importable
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--process_id", str(i),
         "--root", root, "--port", str(PORT)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(N_PROCESSES)]
    try:
        outs = [p.communicate(timeout=2400)[0] for p in procs]
    except subprocess.TimeoutExpired:
        # never leave orphaned workers chewing the host's (single) core
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        print("FAIL: workers timed out; killed")
        for i, out in enumerate(outs):
            print(f"--- worker {i} output ---\n{out}")
        return 1
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"--- worker {i} output ---\n{out}")
            print(f"FAIL: worker {i} exited {p.returncode}")
            return 1

    losses = []
    for i, out in enumerate(outs):
        m = re.search(r"MULTIHOST_OK process=%d losses=([\d.,-]+)" % i, out)
        if not m:
            print(f"--- worker {i} output ---\n{out}")
            print(f"FAIL: worker {i} printed no MULTIHOST_OK line")
            return 1
        losses.append([float(v) for v in m.group(1).split(",")])
    if losses[0] != losses[1]:
        print(f"FAIL: processes disagree on the global loss: {losses}")
        return 1
    print('{"multihost_dryrun": "ok", "processes": %d, "devices": %d, '
          '"steps": %d, "losses": %s}'
          % (N_PROCESSES, N_PROCESSES * LOCAL_DEVICES, STEPS, losses[0]))
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--port", type=int, default=PORT)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(coordinator())
    worker(args.process_id, args.root, args.port)
