"""Library-level evaluation API with the reference's `evaluation.py` surface.

The reference exposes `val`, `val_new`, `test_category`,
`test_category_training(_new)` as importable functions (evaluation.py:11-175,
imported by training.py:15, trainingKD.py:19, KD/common/base_class.py:15).
These wrappers provide the same call semantics on top of the jit'd eval step
and the single-pass category evaluator.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from pose3d_tpu import geometry
from pose3d_tpu.train import steps as steps_lib
import jax.numpy as jnp


def _run(loader, model, variables, bin_size, kind, want_nce=False):
    eval_step = jax.jit(steps_lib.make_eval_step(model, kind, bin_size))
    preds, labels, losses, nces, counts = [], [], [], [], []
    for batch in loader:
        valid = np.asarray(batch.get("valid", np.ones(len(batch["label"]), bool)))
        feed = {k: jnp.asarray(batch[k]) for k in ("im", "shape", "label", "valid")
                if k in batch}
        m = eval_step(variables, feed)
        preds.append(np.asarray(m["pred"])[valid])
        labels.append(np.asarray(batch["label"])[valid])
        # exact masked per-sample sums (same reduction as evaluate_categories —
        # a batch-mean weighted by valid count would be inexact on padded tails)
        losses.append(float(np.sum(np.asarray(m["per_sample_loss"])[valid])))
        if want_nce:
            if "per_sample_nce" not in m:
                raise ValueError(
                    f"eval step for kind={kind!r} emits no contrastive loss; "
                    "val_new needs kind='teacher' (fused+img_proj outputs)")
            nces.append(float(np.sum(np.asarray(m["per_sample_nce"])[valid])))
        counts.append(int(valid.sum()))
    preds = np.concatenate(preds) if preds else np.zeros((0, 3))
    labels = np.concatenate(labels) if labels else np.zeros((0, 3), np.int32)
    total = max(int(np.sum(counts)), 1)
    loss = float(np.sum(losses)) / total
    nce = float(np.sum(nces)) / total if want_nce else 0.0
    if len(preds):
        acc = float(geometry.rotation_acc(jnp.asarray(preds),
                                          jnp.asarray(labels.astype(np.float32))))
    else:
        acc = 0.0
    return loss, acc, preds, labels, nce


def val(loader, model, variables, bin_size=15, kind="student"):
    """evaluation.py:11-60 parity: (val_loss, val_acc, predictions, labels)."""
    loss, acc, preds, labels, _ = _run(loader, model, variables, bin_size, kind)
    return loss, acc, preds, labels


def val_new(loader, model, variables, bin_size=15, kind="teacher"):
    """evaluation.py:63-117 parity: adds the contrastive val loss."""
    loss, acc, preds, labels, nce = _run(loader, model, variables, bin_size, kind,
                                         want_nce=True)
    return loss, acc, preds, labels, nce


def test_category(loader, model, variables, bin_size, cat, dataset_name,
                  predictions_path=None, logname=None, kind="student"):
    """evaluation.py:121-140 parity: per-category Acc/Med + artifacts."""
    _, _, preds, labels, _ = _run(loader, model, variables, bin_size, kind)
    errs = np.asarray(geometry.rotation_err(
        jnp.asarray(preds), jnp.asarray(labels.astype(np.float32))))
    acc = 100.0 * float(np.mean(errs <= 30)) if len(errs) else 0.0
    med = float(np.median(errs)) if len(errs) else 0.0
    if predictions_path:
        np.save(os.path.join(predictions_path, f"predictions_{cat}.npy"), preds)
    if logname:
        with open(logname, "a") as f:
            f.write("test accuracy for %d images of catgory %s in datatset %s \n"
                    % (len(errs), cat, dataset_name))
            f.write("Med_Err is %.2f, and Acc_pi/6 is %.2f \n \n" % (med, acc))
    return acc, med, errs


def test_category_training(loader, model, variables, bin_size, cat, kind="student"):
    """evaluation.py:142-157 parity."""
    acc, med, _ = test_category(loader, model, variables, bin_size, cat, "", kind=kind)
    return acc, med


def test_category_training_new(loader, model, variables, bin_size, cat,
                               kind="teacher"):
    """evaluation.py:160-175 parity: the val_new-arity variant for teacher
    models returning (outputs, fused, img_proj)."""
    _, _, preds, labels, _ = val_new(loader, model, variables, bin_size, kind)
    errs = np.asarray(geometry.rotation_err(
        jnp.asarray(preds), jnp.asarray(labels.astype(np.float32))))
    acc = 100.0 * float(np.mean(errs <= 30)) if len(errs) else 0.0
    med = float(np.median(errs)) if len(errs) else 0.0
    return acc, med
