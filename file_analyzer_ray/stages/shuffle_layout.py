"""Deterministic global-shuffle export layout for training data.

Training runs consume the corpus in a globally-shuffled order, but a
seeded ``random_shuffle()`` is the wrong tool at 10^12 rows: it is an
all-to-all exchange whose result depends on block structure, so a
resume or a different cluster size re-deals the deck. The
content-keyed layout here is the scale answer (same doctrine as the
engine's leakage-free split and deterministic sample,
``stages/split.py`` / ``stages/sampling.py``): every row's position is
a pure function of its id —

- ``shard = h(id) % n_shards``  — the output file a row lands in,
- ``band  = h(id) >> (32 - log2 n_bands)`` — a sub-order bucket,
- ``pos``  — the row's dense rank within its ``(shard, band)`` run
  under ``(h, id)`` order.

A reader that walks each shard by ``(band, pos)`` sees a fixed
pseudo-random permutation of the corpus, identical across cluster
sizes, block splits, and resumes — and any shard subset is itself an
unbiased shuffled sample (each shard is a uniform hash slice). The
dense rank is computed within bounded ``(shard, band)`` key groups via
ONE sort + run-scan arange, never a global row index (a driver-side
zip-with-index is exactly the scale trap this avoids; group size is
~N / (n_shards * n_bands), tunable to block size).

The reference has no shuffle/export layer (its results go to one JSON
dir, SURVEY.md §2 S6); this supplies the training-export counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def shuffle_export_layout(
    ds: "object", id_col: str, n_shards: int = 16, n_bands: int = 16
) -> "object":
    """(id) → (id, shard, band, pos): the deterministic shuffle-export
    coordinates. ``n_bands`` must be a power of two (the band is a bit
    slice of the 32-bit hash). Output columns are int64 to match the
    DuckDB oracle's BIGINT window arithmetic."""
    if n_bands & (n_bands - 1):
        raise ValueError("n_bands must be a power of two")
    shift = 32 - (n_bands.bit_length() - 1)
    from ..query_utils import _run_starts_mask_arrow, _window_by_key_arrow
    from .sampling import _hash_frac_u32

    def tag(t: pa.Table) -> pa.Table:
        h = _hash_frac_u32(t.column(id_col).to_pylist()).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column(id_col).cast(pa.int64()),
                pa.array(h % n_shards),
                pa.array(h >> shift),
                pa.array(h),
            ],
            names=[id_col, "shard", "band", "_h"],
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def enumerate_runs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=[id_col, "shard", "band", "pos"],
            )
        starts = np.flatnonzero(_run_starts_mask_arrow(t, ["shard", "band"]))
        run_of = np.repeat(
            np.arange(len(starts)), np.diff(np.r_[starts, t.num_rows])
        )
        pos = np.arange(t.num_rows, dtype=np.int64) - starts[run_of]
        return t.drop_columns(["_h"]).append_column("pos", pa.array(pos))

    return _window_by_key_arrow(
        tagged, ["shard", "band"], ["shard", "band", "_h", id_col],
        enumerate_runs,
    )
