"""3-row reconstruction strip (reference ``graphs/reconstructions_plot.py``):
o0 / o1 / imagined-or-reconstructed o1 for the first 7 samples."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def reconstructions_plot(o0, o1, po1, filename, colour=False):
    o0, o1, po1 = (np.asarray(x) for x in (o0, o1, po1))
    if colour:
        rows = [o0[:7], o1[:7], po1[:7]]
    else:
        rows = [o0[:7, :, :, 0], o1[:7, :, :, 0], po1[:7, :, :, 0]]
    fig = plt.figure(figsize=(10, 5))
    for i, (row, label) in enumerate(zip(rows, ["o0", "o1", "o1 reconstr"])):
        ax = plt.subplot(3, 1, i + 1)
        img = np.hstack(list(row))
        if colour:
            ax.imshow(img, vmin=0, vmax=1)
        else:
            ax.imshow(img, cmap="gray", vmin=0, vmax=1)
        ax.set_ylabel(label)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.set_tight_layout(True)
    plt.savefig(filename)
    plt.close(fig)
