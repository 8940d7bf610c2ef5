"""End-to-end CLI smoke tests on the synthetic fixture: teacher training ->
KD training from the saved teacher -> testing, exercising the full
data -> model -> step -> eval -> ckpt -> log path that the reference's
training.py / trainingKD.py / testing.py CLIs cover."""

import os

import numpy as np
import pytest

from pose3d_tpu.data import synthetic

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.make_objectnet3d_fixture(str(root / "ObjectNet3D"),
                                       n_train_per_cat=4, n_val_per_cat=3)
    return str(root)


def _common_args(data_root, result_dir):
    return [
        "--dataset", "ObjectNet3D", "--shape", "PointCloud",
        "--shape_dir", "pointcloud", "--data_root", data_root,
        "--batch_size", "4", "--workers", "0", "--input_dim", "64",
        "--point_num", "64", "--img_feature_dim", "64",
        "--shape_feature_dim", "64", "--result_dir", result_dir,
    ]


def test_teacher_training_then_kd_then_eval(data_root, tmp_path):
    from pose3d_tpu.cli import training, trainingKD

    result_dir = str(tmp_path / "result")
    training.main(_common_args(data_root, result_dir) + ["--n_epoch", "1",
                                                         "--decrease", "1"])

    run_dir = os.path.join(os.getcwd(), result_dir, "PointCloud_ObjectNet3D")
    assert os.path.exists(os.path.join(run_dir, "training_log.txt"))
    log = open(os.path.join(run_dir, "training_log.txt")).read()
    assert "val_acc" in log and "val_contrastive_loss" in log
    teacher_ckpt = os.path.join(run_dir, "ckpt", "checkpoint")
    assert os.path.isdir(teacher_ckpt)
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "checkpoint_img_encoder"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))

    # KD --crd from the saved teacher
    trainingKD.main(_common_args(data_root, result_dir) + [
        "--crd", "--tau", "0.5", "--n_epoch", "1", "--decrease", "1",
        "--student_feature_dim", "64",
        "--teacher_model", teacher_ckpt,
    ])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    kd_log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert "Student Epoch" in kd_log
    assert os.path.isdir(os.path.join(kd_dir, "ckpt", "checkpoint"))


def test_teacher_training_shm_loader(data_root, tmp_path):
    """Same 1-epoch teacher run through the shared-memory process loader."""
    from pose3d_tpu.cli import training

    result_dir = str(tmp_path / "result_shm")
    training.main(_common_args(data_root, result_dir) + [
        "--n_epoch", "1", "--decrease", "1", "--loader", "shm",
        "--workers", "1"])
    run_dir = os.path.join(os.getcwd(), result_dir, "PointCloud_ObjectNet3D")
    log = open(os.path.join(run_dir, "training_log.txt")).read()
    assert "val_acc" in log


def test_stage1_and_stage2_dispatch(data_root, tmp_path):
    """--stage 1 (joint teacher+learner) and --stage 2 (response KD) run end
    to end through the CLI dispatch (trainingKD.py:280-287 parity)."""
    from pose3d_tpu.cli import trainingKD

    result_dir = str(tmp_path / "result")
    base = _common_args(data_root, result_dir) + [
        "--student_feature_dim", "64", "--n_epoch", "1", "--decrease", "1"]
    trainingKD.main(base + ["--stage", "1", "--tau", "0.5"])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    ckpt = os.path.join(kd_dir, "ckpt", "checkpoint")
    assert os.path.isdir(ckpt)

    trainingKD.main(base + ["--stage", "2"])
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert log.count("Student Epoch") >= 2


def test_teacher_training_multiview(tmp_path):
    """MultiView teacher regime (reference --shape MultiView): renders ring
    loader -> ShapeEncoderMV -> DeformNet fusion, 1 epoch through the CLI."""
    from pose3d_tpu.cli import training

    data_root = str(tmp_path / "data")
    synthetic.make_objectnet3d_fixture(
        os.path.join(data_root, "ObjectNet3D"), n_train_per_cat=4,
        n_val_per_cat=2, with_renders=True, render_size=24)
    result_dir = str(tmp_path / "result_mv")
    training.main([
        "--dataset", "ObjectNet3D", "--shape", "MultiView",
        "--shape_dir", "Renders_semi_sphere", "--data_root", data_root,
        "--batch_size", "4", "--workers", "0", "--input_dim", "64",
        "--view_num", "4", "--tour", "2", "--img_feature_dim", "64",
        "--shape_feature_dim", "16", "--n_epoch", "1", "--decrease", "1",
        "--result_dir", result_dir,
    ])
    run_dir = os.path.join(os.getcwd(), result_dir, "MultiView_ObjectNet3D")
    log = open(os.path.join(run_dir, "training_log.txt")).read()
    assert "val_acc" in log
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "checkpoint"))


def test_teacher_resume_from_checkpoint(data_root, tmp_path, capsys):
    """Crash-recovery path (SURVEY.md §5 failure detection/resume): a second
    invocation with --resume restores the latest orbax checkpoint and
    continues from the next epoch instead of restarting from scratch."""
    from pose3d_tpu.cli import training

    result_dir = str(tmp_path / "result_resume")
    args = _common_args(data_root, result_dir) + ["--decrease", "5"]
    training.main(args + ["--n_epoch", "1"])
    capsys.readouterr()
    training.main(args + ["--n_epoch", "2", "--resume"])
    out = capsys.readouterr().out
    assert "resumed from epoch 0" in out
    run_dir = os.path.join(os.getcwd(), result_dir, "PointCloud_ObjectNet3D")
    log = open(os.path.join(run_dir, "training_log.txt")).read()
    # epoch 1 trained exactly once, by the resumed run
    assert log.count("Epoch: 001") == 1


def test_fewshot_training_runs(data_root, tmp_path):
    """--shot K samples K train images per class (BASELINE config 5)."""
    from pose3d_tpu.cli import training

    result_dir = str(tmp_path / "result")
    training.main(_common_args(data_root, result_dir) +
                  ["--n_epoch", "1", "--decrease", "1", "--shot", "2"])
    log = open(os.path.join(os.getcwd(), result_dir, "PointCloud_ObjectNet3D",
                            "training_log.txt")).read()
    # 2 cats x 2 shots = 4 training samples
    assert "training set: 4" in log


def test_shapenet_to_pix3d_train_eval(tmp_path):
    """Synthetic-train/real-eval protocol (SURVEY.md §2a #4): train on
    ShapeNet composites over SUN backgrounds, evaluate on Pix3D — the full
    train->ckpt->testing chain at the native 224px ShapeNet crop size."""
    import numpy as np

    from pose3d_tpu.cli import testing, training
    from pose3d_tpu.data import synthetic

    data_root = str(tmp_path / "data")
    synthetic.make_shapenet_fixture(os.path.join(data_root, "ShapeNetCore"),
                                    os.path.join(data_root, "SUN"),
                                    image_size=240)
    synthetic.make_pix3d_eval_fixture(os.path.join(data_root, "Pix3D"))
    test_root = str(tmp_path / "test_data")
    synthetic.make_pix3d_fixture(os.path.join(test_root, "Pix3D"), n_per_cat=2)

    result_dir = str(tmp_path / "result")
    training.main([
        "--dataset", "ShapeNetCore", "--shape", "None", "--data_root",
        data_root, "--batch_size", "2", "--workers", "0",
        "--img_feature_dim", "32", "--n_epoch", "1", "--decrease", "1",
        "--result_dir", result_dir,
    ])
    run_dir = os.path.join(os.getcwd(), result_dir, "baseline_ShapeNetCore")
    assert "val_acc" in open(os.path.join(run_dir, "training_log.txt")).read()
    ckpt = os.path.join(run_dir, "ckpt", "checkpoint")
    assert os.path.isdir(ckpt)

    # evaluate the ShapeNet-trained student on Pix3D via the testing CLI
    out_dir = str(tmp_path / "preds")
    result = testing.main([
        "--dataset", "Pix3D", "--shape", "None", "--data_root", test_root,
        "--batch_size", "2", "--workers", "0", "--img_feature_dim", "32",
        "--model", ckpt, "--output_dir", out_dir,
    ])
    assert np.isfinite(result.sample_med)
    assert os.path.exists(os.path.join(out_dir, "testing_log.txt"))


def test_testing_cli_linemod(tmp_path):
    from pose3d_tpu.cli import testing
    from pose3d_tpu.data import synthetic

    root = tmp_path / "data" / "LineMod"
    synthetic.make_linemod_fixture(str(root))
    out_dir = str(tmp_path / "preds_lm")
    result = testing.main([
        "--dataset", "LineMod", "--shape", "None", "--data_root",
        str(tmp_path / "data"), "--batch_size", "4", "--workers", "0",
        "--input_dim", "32", "--img_feature_dim", "32", "--output_dir", out_dir,
    ])
    assert "Average for all categories" in open(
        os.path.join(out_dir, "testing_log.txt")).read()
    assert len(result.per_category_acc) == 2  # obj 1 and 2


def test_testing_cli_dp_mesh_matches_single_device(tmp_path):
    """Dataset-scale eval sharded over the 8-device DP mesh must reproduce
    the single-device result exactly — padded tail rows (fixture size does
    not divide 8) are masked out of every statistic, and the per-category
    reduction happens on gathered host arrays either way."""
    from pose3d_tpu.cli import testing
    from pose3d_tpu.data import synthetic

    root = tmp_path / "data" / "LineMod"
    synthetic.make_linemod_fixture(str(root))
    args = ["--dataset", "LineMod", "--shape", "None", "--data_root",
            str(tmp_path / "data"), "--batch_size", "6", "--workers", "0",
            "--input_dim", "32", "--img_feature_dim", "32"]
    one = testing.main(args + ["--output_dir", str(tmp_path / "p1"),
                               "--n_devices", "1"])
    dp = testing.main(args + ["--output_dir", str(tmp_path / "p8")])
    assert set(dp.per_category_acc) == set(one.per_category_acc)
    for cat in one.per_category_acc:
        assert dp.per_category_acc[cat] == one.per_category_acc[cat]
        assert abs(dp.per_category_med[cat] - one.per_category_med[cat]) < 1e-3
    np.testing.assert_allclose(dp.predictions, one.predictions, atol=1e-3)
    assert abs(dp.sample_med - one.sample_med) < 1e-3


def test_testing_cli_int8(data_root, tmp_path):
    """--int8 on the testing CLI: dataset-scale eval through the PTQ serving
    path (student kind here), same per-category surface; Acc/Med must track
    the bf16 eval closely on the fixture (random-init student — this pins
    wiring, the accuracy evidence on trained weights lives in
    benchmarks/int8_student_eval.py)."""
    from pose3d_tpu.cli import testing

    args = ["--dataset", "ObjectNet3D", "--shape", "None", "--data_root",
            data_root, "--batch_size", "4", "--workers", "0",
            "--input_dim", "64", "--img_feature_dim", "64"]
    ref = testing.main(args + ["--output_dir", str(tmp_path / "p_bf16")])
    q = testing.main(args + ["--output_dir", str(tmp_path / "p_int8"),
                             "--int8"])
    assert "Average for all categories" in open(
        os.path.join(str(tmp_path / "p_int8"), "testing_log.txt")).read()
    assert set(q.per_category_acc) == set(ref.per_category_acc)
    assert abs(q.sample_med - ref.sample_med) < 15.0  # same decode surface


def test_testing_cli_pix3d(tmp_path):
    from pose3d_tpu.cli import testing
    from pose3d_tpu.data import synthetic

    root = tmp_path / "data" / "Pix3D"
    synthetic.make_pix3d_fixture(str(root), n_per_cat=3)
    out_dir = str(tmp_path / "preds_px")
    result = testing.main([
        "--dataset", "Pix3D", "--shape", "None", "--data_root",
        str(tmp_path / "data"), "--batch_size", "4", "--workers", "0",
        "--input_dim", "32", "--img_feature_dim", "32", "--output_dir", out_dir,
    ])
    assert result.sample_med >= 0.0
    assert len(result.per_category_acc) >= 1


def test_testing_cli_teacher_pointcloud(data_root, tmp_path):
    """Teacher eval path through the testing CLI (--shape PointCloud)."""
    from pose3d_tpu.cli import testing

    out_dir = str(tmp_path / "preds_teacher")
    result = testing.main([
        "--dataset", "ObjectNet3D", "--shape", "PointCloud", "--shape_dir",
        "pointcloud", "--data_root", data_root, "--batch_size", "4",
        "--workers", "0", "--input_dim", "64", "--point_num", "64",
        "--img_feature_dim", "64", "--shape_feature_dim", "64",
        "--output_dir", out_dir,
    ])
    assert 0.0 <= result.mean_acc <= 100.0
    assert os.path.exists(os.path.join(out_dir, "testing_log.txt"))


def test_testing_cli_teacher_multiview(tmp_path):
    """Per-category eval sweep for a MultiView teacher — exercises the
    render-emitting contrast-val path (the reference crashes here)."""
    from pose3d_tpu.cli import testing
    from pose3d_tpu.data import synthetic

    data_root = str(tmp_path / "data")
    synthetic.make_objectnet3d_fixture(
        os.path.join(data_root, "ObjectNet3D"), n_train_per_cat=2,
        n_val_per_cat=2, with_renders=True, render_size=24)
    out_dir = str(tmp_path / "preds_mv")
    result = testing.main([
        "--dataset", "ObjectNet3D", "--shape", "MultiView", "--shape_dir",
        "Renders_semi_sphere", "--data_root", data_root, "--batch_size", "4",
        "--workers", "0", "--input_dim", "64", "--view_num", "4", "--tour",
        "2", "--img_feature_dim", "64", "--shape_feature_dim", "16",
        "--output_dir", out_dir,
    ])
    assert 0.0 <= result.mean_acc <= 100.0
    assert os.path.exists(os.path.join(out_dir, "testing_log.txt"))


def test_testing_cli_student(data_root, tmp_path):
    from pose3d_tpu.cli import testing

    out_dir = str(tmp_path / "preds")
    result = testing.main([
        "--dataset", "ObjectNet3D", "--shape", "None", "--data_root", data_root,
        "--batch_size", "4", "--workers", "0", "--input_dim", "64",
        "--img_feature_dim", "64", "--output_dir", out_dir,
    ])
    log = open(os.path.join(out_dir, "testing_log.txt")).read()
    assert "Average for all categories" in log
    assert "Average for all Samples" in log
    # per-category predictions dumped
    names = os.listdir(out_dir)
    assert any(n.startswith("predictions_") and n.endswith(".npy") for n in names)
    assert 0.0 <= result.mean_acc <= 100.0
    assert result.sample_med >= 0.0


def test_kd_crd_pascal3d(tmp_path):
    """--dataset Pascal3D --crd end to end (round-1 VERDICT missing #2): the
    KD CLI must build Pascal3DContrast for Pascal3D+ so the 3-view keys exist
    (reference trainingKD.py:171-178)."""
    from pose3d_tpu.cli import trainingKD

    data_root = str(tmp_path / "data")
    synthetic.make_objectnet3d_fixture(
        os.path.join(data_root, "Pascal3D"), n_train_per_cat=4,
        n_val_per_cat=3, dataset_name="Pascal3D")
    result_dir = str(tmp_path / "result")
    trainingKD.main([
        "--dataset", "Pascal3D", "--shape", "PointCloud",
        "--shape_dir", "pointcloud", "--data_root", data_root,
        "--batch_size", "4", "--workers", "0", "--input_dim", "64",
        "--point_num", "64", "--img_feature_dim", "64",
        "--shape_feature_dim", "64", "--result_dir", result_dir,
        "--crd", "--tau", "0.5", "--n_epoch", "1", "--decrease", "1",
        "--student_feature_dim", "64",
    ])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_Pascal3D")
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert "Student Epoch" in log


def test_novel_zeroshot_training(tmp_path):
    """--novel zero-shot regime e2e (reference dataset.py:479-483): train
    EXCLUDES the test categories, eval runs ONLY on them. Fixture has 'bed'
    (an ObjectNet3D test cat) and 'chair' (not a test cat): novel training
    must train on chair-only data yet evaluate on bed."""
    import json

    from pose3d_tpu.cli import training
    from pose3d_tpu.data import datasets
    from pose3d_tpu.data.annotations import OBJECTNET3D_TEST_CATS

    root = tmp_path / "data"
    synthetic.make_objectnet3d_fixture(str(root / "ObjectNet3D"),
                                       categories=("bed", "chair"),
                                       n_train_per_cat=4, n_val_per_cat=3)
    assert "bed" in OBJECTNET3D_TEST_CATS and "chair" not in OBJECTNET3D_TEST_CATS

    # frame-level: the novel train split contains no test-cat samples
    ds_train = datasets.Pascal3DContrast(
        str(root / "ObjectNet3D"), "ObjectNet3D.txt", train=True,
        cat_choice=OBJECTNET3D_TEST_CATS, novel=True, shape="PointCloud",
        shape_dir="pointcloud", input_dim=64, point_num=64, seed=46)
    assert set(ds_train.frame.cat) == {"chair"}

    result_dir = str(tmp_path / "result")
    training.main(_common_args(str(root), result_dir) +
                  ["--novel", "--n_epoch", "1", "--decrease", "1"])

    run_dir = os.path.join(os.getcwd(), result_dir,
                           "PointCloud_ObjectNet3D_novel")
    assert os.path.exists(os.path.join(run_dir, "training_log.txt"))
    # eval ran on the held-out test cats only: per-category metrics name bed
    metrics = [json.loads(l) for l in
               open(os.path.join(run_dir, "metrics.jsonl"))]
    per_cat = [m["per_category_acc"] for m in metrics
               if "per_category_acc" in m]
    assert per_cat and set(per_cat[-1]) == {"bed"}


def test_stage1_memory_bank_cli(data_root, tmp_path):
    """--use_memory_bank e2e: the stage-1 MoCo-queue EXTENSION dispatches
    through the trainingKD CLI and trains both models."""
    from pose3d_tpu.cli import trainingKD

    result_dir = str(tmp_path / "result")
    trainingKD.main(_common_args(data_root, result_dir) + [
        "--stage", "1", "--n_epoch", "1", "--decrease", "1",
        "--student_feature_dim", "64",
        "--use_memory_bank", "--memory_bank_size", "64",
    ])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert "Student Epoch" in log
    assert os.path.isdir(os.path.join(kd_dir, "ckpt", "checkpoint"))

    # the bank is persisted in the checkpoint (ADVICE r2: a resumed run must
    # not restart the negative queue cold)
    from pose3d_tpu.train.ckpt import Checkpointer

    restored = Checkpointer(os.path.join(kd_dir, "ckpt")).restore("checkpoint")
    assert "bank" in restored
    assert int(restored["bank"]["filled"]) > 0
    assert restored["bank"]["queue"].shape == (64, 200)


def test_kd_crd_device_views(data_root, tmp_path):
    """--device_views e2e: KD --crd with on-device flip/rot view synthesis
    (one decoded crop per sample leaves the host; ops/augment.synthesize_views
    builds the 3-view batch inside the jit step)."""
    from pose3d_tpu.cli import trainingKD

    result_dir = str(tmp_path / "result")
    trainingKD.main(_common_args(data_root, result_dir) + [
        "--crd", "--tau", "0.5", "--n_epoch", "1", "--decrease", "1",
        "--student_feature_dim", "64", "--device_views",
    ])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert "Student Epoch" in log
    assert os.path.isdir(os.path.join(kd_dir, "ckpt", "checkpoint"))


def test_kd_crd_int8_teacher(data_root, tmp_path):
    """--int8_teacher e2e: KD --crd with the frozen teacher's resnet50 run
    through the int8 PTQ serving path inside the train step
    (serving/quant_teacher.py; calibrated on the first eval batch)."""
    from pose3d_tpu.cli import trainingKD

    result_dir = str(tmp_path / "result")
    trainingKD.main(_common_args(data_root, result_dir) + [
        "--crd", "--tau", "0.5", "--n_epoch", "1", "--decrease", "1",
        "--student_feature_dim", "64", "--int8_teacher",
    ])
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    assert "Student Epoch" in log
    assert os.path.isdir(os.path.join(kd_dir, "ckpt", "checkpoint"))


def test_stage1_memory_bank_resume(data_root, tmp_path, capsys):
    """--stage 1 --resume restores teacher+student+memory bank and continues
    from the next epoch (previously stage 1 had no resume path at all)."""
    from pose3d_tpu.cli import trainingKD

    result_dir = str(tmp_path / "result")
    args = _common_args(data_root, result_dir) + [
        "--stage", "1", "--decrease", "5", "--student_feature_dim", "64",
        "--use_memory_bank", "--memory_bank_size", "64",
    ]
    trainingKD.main(args + ["--n_epoch", "1"])
    capsys.readouterr()
    trainingKD.main(args + ["--n_epoch", "2", "--resume"])
    out = capsys.readouterr().out
    assert "resuming stage 1 from epoch 0" in out
    kd_dir = os.path.join(os.getcwd(), result_dir, "KD_ObjectNet3D")
    log = open(os.path.join(kd_dir, "training_log.txt")).read()
    # epoch 2 trained exactly once, by the resumed run; no cold-bank warning
    assert log.count("Epoch: 002") == 1
    assert "WARNING: resuming stage 1 without a saved memory bank" not in log
