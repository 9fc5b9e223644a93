"""Visualization helpers: feature-cluster scatters and point-cloud renders.

Reference: utils/visual_utils.py:4-45 (cluster scatter PNGs written by the
offline splitter) and utils/visualize_sample.py:21-35 (cloud scatter).
Matplotlib is imported lazily and failures degrade to no-ops so headless /
minimal images never break the pipelines that call these.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def visualize_feature_scatter(
    features: np.ndarray,
    cls: Optional[int] = None,
    labels_: Optional[np.ndarray] = None,
    cluster_centers: Optional[np.ndarray] = None,
    file_path: Optional[str] = None,
):
    """2-D scatter of (reduced) features colored by cluster label."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    fig, ax = plt.subplots(figsize=(6, 6))
    feats = np.asarray(features)
    c = np.asarray(labels_) if labels_ is not None else None
    sc = ax.scatter(feats[:, 0], feats[:, 1], c=c, cmap="tab10", s=8)
    if cluster_centers is not None:
        cc = np.asarray(cluster_centers)
        ax.scatter(cc[:, 0], cc[:, 1], c="black", marker="x", s=80)
    if labels_ is not None:
        fig.colorbar(sc, ax=ax)
    ax.set_title(f"class {cls}" if cls is not None else "features")
    if file_path:
        os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
        fig.savefig(file_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return file_path


def draw_pc(
    pc: np.ndarray,
    show: bool = False,
    save_dir: Optional[str] = None,
    text_: Optional[str] = None,
    pc_2: Optional[np.ndarray] = None,
):
    """3-D scatter of one (optionally two) clouds
    (reference utils/visualize_sample.py:21-35)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    p = np.asarray(pc)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=3, c="tab:blue")
    if pc_2 is not None:
        q = np.asarray(pc_2)
        ax.scatter(q[:, 0], q[:, 1], q[:, 2], s=3, c="tab:orange")
    if text_:
        ax.set_title(text_)
    out = None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, (text_ or "cloud") + ".png")
        fig.savefig(out, dpi=100, bbox_inches="tight")
    if show:  # pragma: no cover - interactive
        plt.show()
    plt.close(fig)
    return out
