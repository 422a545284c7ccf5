"""Bundled example datasets.

Reference: src/data.jl:1-21 (`dataset`, `datasets`) and the manifests
doc/datasets.csv — the classic public datasets used by the reference's
examples:

  * ``swiss`` — Swiss banknote data: 200×4 measurements + 200 status
    labels (Bayesian logistic regression workload,
    doc/examples/swiss/*);
  * ``rats``  — BUGS rats growth data: 5 ages × 30 rats' weights
    (hierarchical normal model, doc/examples/rats/).

Stored as .npz (same numbers as the reference's CSVs, binary format).
"""

from __future__ import annotations

import os

import numpy as np

_HERE = os.path.dirname(__file__)

_MANIFEST = {
    "swiss": ("swiss.npz", ("measurements", "status")),
    "rats": ("rats.npz", ("age", "weight")),
}


def datasets():
    """List available datasets (reference data.jl `datasets`)."""
    return sorted(_MANIFEST)


def examples():
    """List the bundled runnable examples (reference data.jl `examples`,
    manifest doc/examples/examples.csv)."""
    root = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "examples")
    if not os.path.isdir(root):
        return []
    return sorted(
        f[:-3] for f in os.listdir(root) if f.endswith(".py") and f != "run_examples.py"
    )


def dataset(name: str, *fields: str):
    """Load dataset arrays (reference data.jl `dataset`).

    ``dataset('swiss', 'measurements')`` -> (200, 4) float array.
    With no fields given, returns a dict of all arrays.
    """
    if name not in _MANIFEST:
        raise KeyError(f"unknown dataset {name!r}; available: {datasets()}")
    fname, available = _MANIFEST[name]
    with np.load(os.path.join(_HERE, "files", fname)) as z:
        if not fields:
            return {k: z[k] for k in available}
        out = []
        for f in fields:
            if f not in available:
                raise KeyError(f"dataset {name!r} has fields {available}")
            out.append(z[f])
    return out[0] if len(out) == 1 else tuple(out)
