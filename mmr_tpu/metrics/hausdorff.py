"""Hausdorff distance between binary masks — host-side, heavy-cadence metric.

The reference uses ``skimage.metrics.hausdorff_distance`` per class on the
every-25-epochs slow path, capping ∞ (one mask empty) at 1000
(``ModelTraining.py:47,622-654``). skimage is not in this image; the symmetric
Hausdorff is computed from scipy's KD-tree nearest-neighbour queries, which
matches skimage's definition: max over both directed Hausdorff distances
between the nonzero-pixel coordinate sets. Kept host-side deliberately — it has
no efficient XLA form and runs off the training critical path (SURVEY.md §7.3(7)).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

INF_CAP = 1000.0  # ModelTraining.py:644


def hausdorff_distance(im1, im2, inf_cap: float | None = None) -> float:
    a = np.argwhere(np.asarray(im1).astype(bool))
    b = np.argwhere(np.asarray(im2).astype(bool))
    if a.size == 0 and b.size == 0:
        return 0.0
    if a.size == 0 or b.size == 0:
        return float(inf_cap) if inf_cap is not None else float("inf")
    d_ab = cKDTree(b).query(a, k=1)[0].max()
    d_ba = cKDTree(a).query(b, k=1)[0].max()
    return float(max(d_ab, d_ba))


def capped_hausdorff(im1, im2) -> float:
    """The exact Path-A flavour: ∞ → 1000 (``ModelTraining.py:640-644``)."""
    d = hausdorff_distance(im1, im2)
    return INF_CAP if np.isinf(d) else d
