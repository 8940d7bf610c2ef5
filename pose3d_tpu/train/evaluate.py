"""Evaluation driver: ONE pass over the val set with per-category reductions.

The reference rebuilds a Pascal3DContrast dataset + DataLoader per category
per epoch (base_class.py:717-721, training.py:320-326) — a 20x wall-clock
waste. Here the loader emits a `cat_id` per sample and we make a single
batched jit'd sweep, then reduce errors per category on host (tiny arrays).

Produces the same numbers the reference logs:
  * per-category Acc@pi/6 = 100 * mean(err <= 30) and MedErr = median(err)
    (evaluation.py:131-140)
  * category-mean Acc / Med (testing.py:145-147)
  * sample-mean Acc / Med — the reference's summary line swaps these two
    values (testing.py:149-150, a known defect per SURVEY.md); we report them
    correctly and label the swap.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable

import numpy as np

from pose3d_tpu import geometry
import jax.numpy as jnp


@dataclass
class CategoryEvalResult:
    per_category_acc: dict[str, float]
    per_category_med: dict[str, float]
    mean_acc: float = 0.0
    mean_med: float = 0.0
    sample_acc: float = 0.0
    sample_med: float = 0.0
    val_loss: float = 0.0
    val_nce_loss: float = 0.0
    predictions: np.ndarray = field(default=None, repr=False)
    labels: np.ndarray = field(default=None, repr=False)
    errors: np.ndarray = field(default=None, repr=False)
    cat_ids: np.ndarray = field(default=None, repr=False)


def evaluate_categories(
    eval_step: Callable,
    variables,
    batches: Iterable[dict],
    category_names: list[str],
    threshold: float = 30.0,
) -> CategoryEvalResult:
    """Run `eval_step(variables, batch)` over all batches and reduce.

    Each batch dict must carry 'im', 'label' (+'shape' for teacher paths),
    'cat_id' (int per sample, indexing category_names) and 'valid' (bool mask
    for padded tail batches; padded rows are dropped from every statistic).
    """
    all_preds, all_labels, all_cats = [], [], []
    losses, nces, counts = [], [], []

    for batch in batches:
        valid = np.asarray(batch.get("valid", np.ones(len(batch["label"]), bool)))
        metrics = eval_step(variables, {
            k: v for k, v in batch.items()
            # shape_id/shape_rot/shape_seed/shape_mut: device-resident
            # shape-bank references (ops/shape_bank.py) in --device_shapes
            # eval — the step resolves them against its bank
            if k in ("im", "shape", "label", "valid", "shape_id",
                     "shape_rot", "shape_seed", "shape_mut")})
        preds = np.asarray(metrics["pred"])[valid]
        labels = np.asarray(batch["label"])[valid]
        all_preds.append(preds)
        all_labels.append(labels)
        all_cats.append(np.asarray(batch["cat_id"])[valid])
        # exact masking of padded tail rows; per_sample_loss is required — a
        # batch-mean fallback weighted by valid count would be inexact on
        # padded tails (the mean includes padded rows)
        losses.append(float(np.sum(np.asarray(metrics["per_sample_loss"])[valid])))
        if "per_sample_nce" in metrics:
            # per-sample NCE with padded keys masked inside the step — padded
            # rows contribute neither negatives nor mean mass
            nces.append(float(np.sum(np.asarray(metrics["per_sample_nce"])[valid])))
        else:
            nces.append(0.0)
        counts.append(valid.sum())

    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    cats = np.concatenate(all_cats)
    total = max(int(np.sum(counts)), 1)

    errs = np.asarray(geometry.rotation_err(jnp.asarray(preds),
                                            jnp.asarray(labels.astype(np.float32))))

    per_acc, per_med = {}, {}
    for ci, name in enumerate(category_names):
        mask = cats == ci
        if not mask.any():
            continue
        e = errs[mask]
        per_acc[name] = 100.0 * float(np.mean(e <= threshold))
        per_med[name] = float(np.median(e))

    return CategoryEvalResult(
        per_category_acc=per_acc,
        per_category_med=per_med,
        mean_acc=float(np.mean(list(per_acc.values()))) if per_acc else 0.0,
        mean_med=float(np.mean(list(per_med.values()))) if per_med else 0.0,
        sample_acc=100.0 * float(np.mean(errs <= threshold)),
        sample_med=float(np.median(errs)),
        val_loss=float(np.sum(losses)) / total,
        val_nce_loss=float(np.sum(nces)) / total,
        predictions=preds,
        labels=labels,
        errors=errs,
        cat_ids=cats,
    )
