"""Teacher / baseline training CLI — flag-compatible with the reference
`training.py` (reference training.py:155-191 for the flag set; §3.1 of
SURVEY.md for the flow).

Example (reference README.md:62-64 recipe):
  python -m pose3d_tpu.cli.training --dataset ObjectNet3D --shape PointCloud \
      --shape_dir pointcloud --batch_size 160 --n_epoch 300 --lr 1e-4 \
      --decrease 200 --random
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from pose3d_tpu.cli import common
from pose3d_tpu.data.loader import DataLoader
from pose3d_tpu.parallel import replicate
from pose3d_tpu.train import create_train_state, multistep_lr, torch_style_adam
from pose3d_tpu.train.trainer import TeacherTrainer
from pose3d_tpu.utils import TxtLogger


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--decrease", type=int, default=130, help="epoch to decrease")
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--print_freq", type=int, default=50)
    parser.add_argument("--result_dir", type=str, default="result")
    parser.add_argument("--resume", action="store_true",
                        help="auto-resume from the latest checkpoint")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of early steps here")
    parser.add_argument("--fused_nce", action="store_true",
                        help="route the contrastive term through the Pallas "
                             "NCE kernels (ops/nce_fused.py single-block up "
                             "to b=1024, ops/nce_blocked.py blocked-Gram "
                             "beyond — the >16-chip global-batch regime). "
                             "Identical math; XLA is the measured default "
                             "at the reference batch sizes (docs/PERF.md)")
    parser.add_argument("--device_shapes", action="store_true",
                        help="keep all point clouds device-resident "
                             "(ops/shape_bank.py): the loader emits 3 scalars"
                             " per sample and the train step gathers+samples "
                             "the cloud on-device; PointCloud only")
    parser.add_argument("--device_augment", action="store_true",
                        help="run photometric augs + normalize on-device")
    parser.add_argument("--nce", type=str, default="info",
                        choices=["info", "pose", "multipose"],
                        help="contrastive term for the teacher loss: 'info' "
                             "(infoNCE_KD, the reference recipe) or the "
                             "pose-weighted family (poseNCE_KD / "
                             "multiposeNCE_KD — implemented but dead in the "
                             "reference, model_utils.py:225-261/306-351; "
                             "opt-in here)")
    parser.add_argument("--weighting", type=str, default=None,
                        choices=["linear", "square", "sqrt", "sin", "sinsin"],
                        help="pose-distance weighting scheme; requires "
                             "--nce pose")
    opt = parser.parse_args(argv)
    common.normalize_shape(opt)
    if opt.weighting is not None and opt.nce != "pose":
        raise SystemExit("--weighting is consumed only by --nce pose "
                         "(refusing to accept-and-ignore it)")
    if opt.nce != "info" and opt.shape is None:
        raise SystemExit("--nce pose/multipose applies to teacher training "
                         "(--shape ...); the RGB baseline has no "
                         "contrastive term")
    if opt.fused_nce and opt.nce != "info":
        import sys

        print("WARNING: the Pallas NCE kernels implement the infoNCE term "
              "only; --nce pose/multipose takes the XLA lowering "
              "(train/steps.py route_info_nce) — continuing WITHOUT "
              "--fused_nce", file=sys.stderr)
        opt.fused_nce = False
    return opt


def main(argv=None):
    opt = parse_args(argv)
    print(opt)

    dataset_train, dataset_eval = common.build_train_eval_datasets(opt)
    # drop_last=True: jit needs static shapes, and padding the tail batch
    # would push duplicate samples into the gradient — dropping the ragged
    # tail is the exact-equivalence choice under data parallelism
    train_loader = common.make_train_loader(dataset_train, opt)
    eval_loader = DataLoader(dataset_eval, opt.batch_size, shuffle=False,
                             num_workers=opt.workers, seed=common.MANUAL_SEED)

    if opt.shape is None:
        print("Baseline!")
        model = common.build_student(opt)
        example = (jnp.zeros((1, opt.input_dim, opt.input_dim, 3)),)
    else:
        model = common.build_teacher(opt)
        if opt.shape == "PointCloud":
            shape_ex = jnp.zeros((1, opt.point_num, 3))
        else:
            shape_ex = jnp.zeros((1, opt.view_num, opt.input_dim, opt.input_dim, 3))
        example = (jnp.zeros((1, opt.input_dim, opt.input_dim, 3)), shape_ex)

    steps_per_epoch = max(len(train_loader), 1)
    schedule = multistep_lr(opt.lr, [opt.decrease * steps_per_epoch])
    tx = torch_style_adam(schedule, weight_decay=5e-4)
    state = create_train_state(model, example, jax.random.key(common.MANUAL_SEED), tx)

    mesh = common.make_dp_mesh(opt)
    if mesh is not None:
        state = replicate(state, mesh)

    training_mode = (f"baseline_{opt.dataset}" if opt.shape is None
                     else f"{opt.shape}_{opt.dataset}")
    if opt.novel:
        training_mode += "_novel"
    result_path = os.path.join(os.getcwd(), opt.result_dir, training_mode)
    os.makedirs(result_path, exist_ok=True)

    log = TxtLogger(os.path.join(result_path, "training_log.txt"))
    log.line(str(opt) + "\n")
    log.line("training set: " + str(len(dataset_train)))
    log.line("evaluation set: " + str(len(dataset_eval)))

    from pose3d_tpu.config import RunConfig

    with open(os.path.join(result_path, "config.json"), "w") as f:
        f.write(RunConfig.from_namespace(opt).to_json())

    if opt.shape is None:
        # supervised RGB-only baseline (train_vanilla path, training.py:92-148)
        from pose3d_tpu.train.trainer import SupervisedTrainer

        trainer = SupervisedTrainer(model, state, train_loader, eval_loader,
                                    dataset_eval.category_names, result_path,
                                    kind="student", bin_size=opt.bin_size,
                                    mesh=mesh, print_freq=opt.print_freq)
    else:
        # the per-category Acc sweep uses Pascal3DContrast val subsets with
        # keypoint=False (training.py:320-326), distinct from the val_new set
        cat_eval_loader = None
        if opt.dataset in ("ObjectNet3D", "Pascal3D"):
            from pose3d_tpu.data import datasets as ds_mod

            root_dir = os.path.join(opt.data_root, opt.dataset)
            cat_ds = ds_mod.Pascal3DContrast(
                root_dir, f"{opt.dataset}.txt", train=False,
                cat_choice=common.test_cats_for(opt.dataset), keypoint=False,
                novel=False, shape=opt.shape, shape_dir=opt.shape_dir,
                view_num=opt.view_num, tour=opt.tour, input_dim=opt.input_dim,
                point_num=opt.point_num)
            cat_eval_loader = DataLoader(cat_ds, opt.batch_size, shuffle=False,
                                         num_workers=opt.workers,
                                         seed=common.MANUAL_SEED)
            category_names = cat_ds.category_names
        else:
            category_names = dataset_eval.category_names
        if opt.device_augment and hasattr(dataset_train, "host_augment"):
            dataset_train.host_augment = False
        trainer = TeacherTrainer(model, state, train_loader, eval_loader,
                                 category_names, result_path,
                                 bin_size=opt.bin_size, mesh=mesh,
                                 print_freq=opt.print_freq,
                                 cat_eval_loader=cat_eval_loader,
                                 device_augment=opt.device_augment,
                                 use_fused_nce=opt.fused_nce,
                                 shape_bank=common.maybe_shape_bank(
                                     opt, dataset_train),
                                 nce_variant=opt.nce,
                                 nce_weighting=opt.weighting or "linear")
    trainer.profile_dir = opt.profile_dir
    start_epoch = 0
    if opt.resume:
        latest = trainer.ckpt.latest_epoch()
        if latest is not None:
            restored = trainer.ckpt.restore("checkpoint", {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state})
            trainer.state = state.replace(**restored)
            start_epoch = latest + 1
            print(f"resumed from epoch {latest}")
    best = trainer.fit(opt.n_epoch, start_epoch=start_epoch)
    print(f"best val acc: {best:.2f}")


if __name__ == "__main__":
    main()
