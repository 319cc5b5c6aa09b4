"""Rendered-view / segmentation grid writer (reference visualize.py analogue)."""

from __future__ import annotations

import numpy as np

# distinct cluster colors for segmentation maps (reference visualize.py
# colorizes cluster ids over a checkerboard; we use a fixed palette)
_PALETTE = np.array(
    [
        [0.894, 0.102, 0.110],
        [0.216, 0.494, 0.722],
        [0.302, 0.686, 0.290],
        [0.596, 0.306, 0.639],
        [1.000, 0.498, 0.000],
        [1.000, 1.000, 0.200],
        [0.651, 0.337, 0.157],
        [0.969, 0.506, 0.749],
        [0.600, 0.600, 0.600],
        [0.121, 0.471, 0.706],
        [0.682, 0.780, 0.910],
        [0.890, 0.467, 0.761],
    ],
    dtype=np.float32,
)


def colorize_clusters(ids: np.ndarray) -> np.ndarray:
    """Integer cluster maps [B, H, W] -> RGB [B, H, W, 3] via a fixed palette."""
    return _PALETTE[np.asarray(ids) % len(_PALETTE)]


def checkerboard_composite(rgba: np.ndarray, square: int = 8) -> np.ndarray:
    """Composite [..., H, W, 4] RGBA over the reference's light checkerboard
    (visualize.py:7-17): transparent regions show the board."""
    h, w = rgba.shape[-3:-1]
    yy, xx = np.meshgrid(np.arange(h) // square, np.arange(w) // square, indexing="ij")
    board = np.where(((yy + xx) % 2) == 0, 0.8, 0.6)[..., None].astype(np.float32)
    a = rgba[..., 3:4]
    return rgba[..., :3] * a + board * (1.0 - a)


def draw_visualization_grid(columns, path: str):
    """columns: list of (title, data[, kind]) -> grid PNG at <path>.png.

    kind 'image' (default): data [B, H, W, 3] in [0, 1], or [B, H, W, 4]
    RGBA composited over a checkerboard (reference visualize.py:7-17).
    kind 'clustering': data [B, H, W] integer ids, palette-colorized.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = []
    for col in columns:
        title, data = col[0], col[1]
        kind = col[2] if len(col) > 2 else "image"
        if kind == "clustering":
            data = colorize_clusters(data)
        data = np.asarray(data)
        if data.ndim == 4 and data.shape[-1] == 4:
            data = checkerboard_composite(data)
        cols.append((title, data))

    n_rows = cols[0][1].shape[0]
    n_cols = len(cols)
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(1.6 * n_cols, 1.2 * n_rows), squeeze=False
    )
    for c, (title, imgs) in enumerate(cols):
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
