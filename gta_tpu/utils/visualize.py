"""Rendered-view grid writer (reference visualize.py analogue)."""

from __future__ import annotations

import numpy as np


def draw_visualization_grid(columns, path: str):
    """columns: list of (title, images [B, H, W, 3]) -> grid PNG at <path>.png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_rows = columns[0][1].shape[0]
    n_cols = len(columns)
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(1.6 * n_cols, 1.2 * n_rows), squeeze=False
    )
    for c, (title, imgs) in enumerate(columns):
        for r in range(n_rows):
            ax = axes[r][c]
            ax.imshow(np.clip(imgs[r], 0.0, 1.0))
            ax.set_xticks([])
            ax.set_yticks([])
            if r == 0:
                ax.set_title(title, fontsize=7)
    fig.tight_layout(pad=0.2)
    fig.savefig(path + ".png", dpi=120)
    plt.close(fig)
