"""Render the training PSNR/loss curves from a run's metrics.jsonl.

Usage: python -m scripts.plot_metrics <rundir> [out.png]
Writes a two-panel figure (eval PSNR over steps; train loss over steps,
log-y) for the quality-evidence docs.
"""

import json
import os
import sys


def main():
    rundir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(rundir, "curves.png")
    evals, train = [], []
    with open(os.path.join(rundir, "metrics.jsonl")) as f:
        for ln in f:
            d = json.loads(ln)
            if d["kind"] == "eval":
                evals.append((d["it"], d["psnr"]))
            elif d["kind"] == "train":
                train.append((d["it"], d["loss"]))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ink, muted, grid = "#1a1a1a", "#6b6b6b", "#e6e6e6"
    blue = "#2a78d6"
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.2))
    for ax in axes:
        ax.spines[["top", "right"]].set_visible(False)
        ax.spines[["left", "bottom"]].set_color(muted)
        ax.tick_params(colors=muted, labelsize=8)
        ax.grid(True, color=grid, linewidth=0.6, zorder=0)
        ax.set_axisbelow(True)

    ax = axes[0]
    ax.plot(*zip(*evals), color=blue, linewidth=2, zorder=3)
    ax.set_title("Eval PSNR (256 held-out scenes)", fontsize=9, color=ink, loc="left")
    ax.set_xlabel("step", fontsize=8, color=muted)
    if evals:
        it, ps = evals[-1]
        ax.annotate(
            f"{ps:.2f} dB", (it, ps), textcoords="offset points", xytext=(-6, 6),
            ha="right", fontsize=8, color=ink,
        )

    ax = axes[1]
    ax.plot(*zip(*train), color=blue, linewidth=1.2, zorder=3)
    ax.set_yscale("log")
    ax.set_title("Train loss (pixel MSE)", fontsize=9, color=ink, loc="left")
    ax.set_xlabel("step", fontsize=8, color=muted)

    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out} ({len(evals)} eval points, {len(train)} train points)")


if __name__ == "__main__":
    main()
