"""Tests for the evaluation-library parity API (evaluation.py surface)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.data import datasets, loader, synthetic
from pose3d_tpu.models import BaselineEstimator
from pose3d_tpu.train import evaluation_api


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("o3d"))
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=2, n_val_per_cat=3)
    ds = datasets.Pascal3DContrast(root, "ObjectNet3D.txt", train=False,
                                   shape=None, input_dim=32)
    dl = loader.DataLoader(ds, batch_size=4, shuffle=False, num_workers=0)
    model = BaselineEstimator(img_feature_dim=32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    return ds, dl, model, variables


def test_val_returns_reference_tuple(setup):
    ds, dl, model, variables = setup
    loss, acc, preds, labels = evaluation_api.val(dl, model, variables)
    assert preds.shape == (len(ds), 3)
    assert labels.shape == (len(ds), 3)
    assert np.isfinite(loss) and 0.0 <= acc <= 100.0


def test_test_category_writes_artifacts(setup, tmp_path):
    ds, dl, model, variables = setup
    logname = str(tmp_path / "testing_log.txt")
    acc, med, errs = evaluation_api.test_category(
        dl, model, variables, 15, "bed", "ObjectNet3D",
        predictions_path=str(tmp_path), logname=logname)
    assert os.path.exists(str(tmp_path / "predictions_bed.npy"))
    text = open(logname).read()
    assert "Med_Err" in text and "Acc_pi/6" in text
    assert len(errs) == len(ds)
    assert acc == pytest.approx(100.0 * np.mean(errs <= 30), abs=1e-3)
    assert med == pytest.approx(np.median(errs), abs=1e-3)
