"""CSV chain output / read-back.

Reference: src/iostreams/ — `BasicContParamIOStream` keeps one CSV file
per monitored field (``<field>.csv`` under ``filepath``,
BasicContParamIOStream.jl:75-79), appends a row per draw (:152-159), and
can rebuild an in-memory chain from the files (:203-262).

Here the same layout is produced from a completed `Chain` (device trace
buffers are the primary storage; files are an export), with each row one
draw and chains laid out as column groups.  ``read_chain_csv`` rebuilds
the arrays.  For in-loop streaming on TPU use
klara_tpu.io.stream.StreamingWriter (io_callback path).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def write_chain_csv(chain, filepath: str, filesuffix: str = "csv") -> Dict[str, str]:
    """Write one file per monitored field + diagnostics.

    Array (n_post, n_chains, ...) is flattened per draw to a row of
    n_chains*prod(event_shape) comma-separated values (matching the
    reference's comma-joined `write(iostream, state)` rows)."""
    os.makedirs(filepath, exist_ok=True)
    written = {}
    fields = dict(chain.samples)
    fields.update({k: v for k, v in chain.diagnostics.items()})
    for name, arr in fields.items():
        arr = np.asarray(arr)
        flat = arr.reshape(arr.shape[0], -1)
        fname = os.path.join(filepath, f"{name}.{filesuffix}")
        np.savetxt(fname, flat, delimiter=",", fmt="%.9g")
        written[name] = fname
        # shape sidecar so read_chain_csv can restore (n_chains, *event)
        with open(os.path.join(filepath, f"{name}.shape"), "w") as f:
            f.write(",".join(map(str, arr.shape)))
    return written


def read_chain_csv(filepath: str, fields=None, filesuffix: str = "csv"):
    """Rebuild {field: array} from a directory written by write_chain_csv
    (reference `read` path, BasicContParamIOStream.jl:203-262)."""
    out = {}
    names = fields
    if names is None:
        names = [
            f[: -len(f".{filesuffix}")]
            for f in os.listdir(filepath)
            if f.endswith(f".{filesuffix}")
        ]
    for name in names:
        flat = np.loadtxt(
            os.path.join(filepath, f"{name}.{filesuffix}"), delimiter=","
        )
        shape_file = os.path.join(filepath, f"{name}.shape")
        if os.path.exists(shape_file):
            with open(shape_file) as f:
                shape = tuple(int(s) for s in f.read().split(","))
            flat = flat.reshape(shape)
        out[name] = flat
    return out
