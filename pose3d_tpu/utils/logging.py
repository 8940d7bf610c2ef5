"""Logging: the reference's append-only txt artifacts (training_log.txt /
testing_log.txt, training.py:279-289, testing.py:66-72) plus a structured
JSONL metrics stream for programmatic consumption and loss/acc curve dumps.
"""

from __future__ import annotations

import json
import os
import time


class TxtLogger:
    """Append-only text log, drop-in comparable with the reference artifacts."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self, text: str) -> None:
        with open(self.path, "a") as f:
            f.write(text)

    def line(self, text: str) -> None:
        self.write(text + "\n")


class MetricsWriter:
    """JSONL metrics stream: one record per event with wall-clock stamps."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("time", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def plot_curves(path: str, losses, accuracies, epoch: int) -> None:
    """Loss/accuracy curve dump. The reference re-renders .eps via matplotlib
    every epoch (utils.py:118-153); we write the same curves as .csv (cheap,
    diffable) and .eps when matplotlib is available."""
    import numpy as np

    np.savetxt(os.path.join(path, "curves_losses.csv"), losses[: epoch + 1],
               delimiter=",", header="train_loss,val_loss", comments="")
    np.savetxt(os.path.join(path, "curves_accuracies.csv"), accuracies[: epoch + 1],
               delimiter=",", header="train_acc,val_acc", comments="")
    try:
        import matplotlib

        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        for name, arr, ylab in (("fig_losses.eps", losses, "loss"),
                                ("fig_accuracies.eps", accuracies, "accuracy")):
            fig = plt.figure()
            plt.grid()
            xs = np.arange(1, epoch + 2)
            plt.plot(xs, arr[: epoch + 1, 0], "b+-", xs, arr[: epoch + 1, 1], "r+-")
            plt.legend((f"train_{ylab}", f"val_{ylab}"), loc="upper right",
                       fontsize="xx-small")
            plt.xlabel("epoch")
            plt.ylabel(ylab)
            fig.savefig(os.path.join(path, name))
            plt.close(fig)
    except Exception:
        pass  # headless minimal env: csv curves already written
