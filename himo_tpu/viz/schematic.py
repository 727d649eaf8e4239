"""Presentation figures: rolling-shutter distortion explained.

Media-only role parity with the reference's ``tools/manim_himo`` scenes
(2-D LiDAR ray-casting cartoons, SURVEY.md §2.8) without the manim
dependency: matplotlib figures showing (a) a spinning LiDAR sampling a
moving object at different intra-sweep times, (b) the resulting smear, and
(c) the HiMo compensation collapsing it.

    python -m himo_tpu.viz.schematic out_dir=assets/figures
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from himo_tpu.utils.cli import run_cli


def _box_outline(center, size, n=40):
    l, w = size
    t = np.linspace(0, 1, n)
    edges = []
    corners = np.array(
        [[-l / 2, -w / 2], [l / 2, -w / 2], [l / 2, w / 2], [-l / 2, w / 2]]
    )
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        edges.append(a[None] + (b - a)[None] * t[:, None])
    return np.concatenate(edges) + center


def sweep_figure(ax, speed: float, compensated: bool, sweep_dt: float = 0.1):
    """One panel: points sampled over the sweep on an object moving +x."""
    pts = _box_outline((10.0, 0.0), (4.5, 2.0), n=30)
    dts = np.linspace(0, sweep_dt, len(pts))
    rng = np.random.default_rng(0)
    dts = rng.permutation(dts)  # capture order isn't spatial order
    skewed = pts + np.stack([speed * dts, np.zeros_like(dts)], axis=1)
    if compensated:
        dt0 = dts.max() - dts
        skewed = skewed + np.stack([speed * dt0, np.zeros_like(dt0)], axis=1)
    sc = ax.scatter(skewed[:, 0], skewed[:, 1], c=dts, cmap="plasma", s=14)
    truth = _box_outline((10.0 + speed * dts.max(), 0.0), (4.5, 2.0), n=30)
    ax.plot(truth[:, 0], truth[:, 1], "k--", lw=0.8, alpha=0.6)
    ax.set_aspect("equal")
    ax.set_xlim(6, 17)
    ax.set_ylim(-2.5, 2.5)
    title = "compensated (HiMo)" if compensated else f"raw sweep, {speed:.0f} m/s"
    ax.set_title(title, fontsize=10)
    return sc


def main(out_dir: str = "assets/figures", speed: float = 20.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    fig, axes = plt.subplots(1, 2, figsize=(10, 3.2))
    sc = sweep_figure(axes[0], speed, compensated=False)
    sweep_figure(axes[1], speed, compensated=True)
    cbar = fig.colorbar(sc, ax=axes, shrink=0.85)
    cbar.set_label("intra-sweep capture time (s)")
    fig.suptitle(
        "Rolling-shutter smear of a fast object and its HiMo compensation",
        fontsize=11,
    )
    path = out / "rolling_shutter.png"
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Wrote {path}")
    return str(path)


if __name__ == "__main__":
    run_cli(main)
