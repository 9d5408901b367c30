"""Small shared utilities."""

from __future__ import annotations

import numpy as np


def full(shape, fill, dtype=np.float64) -> np.ndarray:
    """Fast ``np.full`` replacement.

    ``np.full``'s scalar ``copyto`` path is two orders of magnitude slower
    than ``empty + fill`` on some builds/VMs (measured ~94ms vs ~0.5ms for
    a 7MB array here), and padded-matrix allocation sits on the per-batch
    hot path.
    """
    a = np.empty(shape, dtype=dtype)
    a.fill(fill)
    return a
