"""Deterministic sampling operators for training-data curation.

Both operators are pure functions of row CONTENT (md5 of the id), never
of partitioning, scan order, or a driver RNG — so any cluster size,
block split or resume produces the identical sample (the property the
engine's shard-fenced resume depends on), and a DuckDB oracle can
recompute them exactly.

- :func:`stratified_sample_rate` — per-stratum Bernoulli keep-rates
  (e.g. downsample dominant languages): row-local vectorized filter,
  NO shuffle, composes anywhere in a plan.
- :func:`sample_k_per_group` — exactly ≤k rows per group, chosen by
  hash order (a deterministic uniform draw): ONE sort by
  (group, hash, id) + run-boundary rank, the engine's grouped top-k
  shape — no per-group dispatch at any group cardinality.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SCALE = float(1 << 32)


def _hash_frac_u32(ids) -> np.ndarray:
    """First 8 md5 hex digits of str(id) as uint32 — the sampling key.
    DuckDB twin: ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)),1,8))
    AS UINT32)``."""
    return np.fromiter(
        (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def stratified_sample_rate(
    ds: "object", strat_col: str, id_col: str,
    rates: "dict[str, float] | float", default_rate: float = 1.0,
) -> "object":
    """Keep each row iff hash_frac(id) < rate(stratum). ``rates`` maps
    stratum value → keep probability (a bare float applies to all)."""
    if isinstance(rates, dict):
        rate_map = dict(rates)
    else:  # a bare float applies to every stratum
        rate_map, default_rate = {}, float(rates)

    def keep(t: pa.Table) -> pa.Table:
        h = _hash_frac_u32(t.column(id_col).to_pylist())
        thr = np.fromiter(
            (rate_map.get(s, default_rate) * _SCALE
             for s in t.column(strat_col).to_pylist()),
            dtype=np.float64,
            count=t.num_rows,
        )
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_k_per_group(
    ds: "object", group_col: str, id_col: str, k: int
) -> "object":
    """≤k rows per group, selected by (hash(id), id) order — a
    deterministic uniform draw per group. ONE sort; rank is a
    run-boundary arange (no per-group dispatch)."""
    from ..query_utils import _run_starts_mask_arrow, _window_by_key_arrow

    def add_hash(t: pa.Table) -> pa.Table:
        h = _hash_frac_u32(t.column(id_col).to_pylist()).astype("int64")
        return t.append_column("_h", pa.array(h))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def rank_keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_h"])
        starts = np.flatnonzero(_run_starts_mask_arrow(t, [group_col]))
        run_of = np.repeat(
            np.arange(len(starts)), np.diff(np.r_[starts, t.num_rows])
        )
        rank = np.arange(t.num_rows) - starts[run_of]
        return t.filter(pa.array(rank < k)).drop_columns(["_h"])

    return _window_by_key_arrow(
        hashed, [group_col], [group_col, "_h", id_col], rank_keep
    )
