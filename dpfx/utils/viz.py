"""Sample visualization / export (SURVEY.md §2 C19).

Depth-shaded orthographic renders (reusing the SVR rasterizer) arranged in
a montage PNG — dependency-light (PIL only, gated), works headless."""

from __future__ import annotations

from typing import Optional

import numpy as np


def save_cloud_montage(
    clouds: np.ndarray,
    path: str,
    views: int = 3,
    tile: int = 128,
    max_clouds: int = 16,
) -> Optional[str]:
    """clouds: [S, N, 3] -> grid PNG (rows = clouds, cols = azimuth views).
    Returns the path, or None when PIL is unavailable."""
    try:
        from PIL import Image
    except ImportError:
        return None

    from dpfx.data.svr import render_cloud

    clouds = np.asarray(clouds)[:max_clouds]
    rows = []
    for c in clouds:
        rows.append(
            np.concatenate(
                [render_cloud(c, size=tile, view=v * (8 // views)) for v in range(views)],
                axis=1,
            )
        )
    img = np.concatenate(rows, axis=0)
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img8).save(path)
    return path
