"""Render checkpointing.

The reference has no checkpointing — only incremental GUI repaint
(reference viewer.h:18-21).  Here the accumulation state (mean image,
variance, sample counters, wave index) round-trips through npz so long
renders survive preemption and can resume deterministically (the sampler is
counter-based, so wave w is reproducible at any time).
"""

from __future__ import annotations

import numpy as np


def save_checkpoint(path: str, **arrays) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
