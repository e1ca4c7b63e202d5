"""Blocked fuzzy record linkage over a name column.

The classic entity-resolution shape (reference analog: the tag/filename
normalization family, ``src/core/analyzer.py`` tag cleaning — here
generalized to approximate NAME matching, the dedup primitive a catalog
/ crawl pipeline runs to merge near-identical entity names):

1. **Distinct-name compression** — the corpus has far fewer distinct
   names than rows (entities repeat), so the first stage is a
   bounded-key aggregate ``name -> n_rows`` (`_preagg_native`: partial
   combiner inside map_batches, cascade merge — no shuffle). Every
   later stage works on the COMPRESSED name table; at 10^12 rows the
   pairwise work is a function of vocabulary, not corpus size.
2. **Token blocking** — each distinct name emits one row per distinct
   token; ONE global sort by token groups candidates; within-run
   pair generation is vectorized (``np.triu_indices`` per run over the
   run-bounds mask). Blocking is PART OF THE SPEC: a pair is a
   candidate iff the two names share >= 1 token (standard recall-
   subject-to-blocking semantics; the DuckDB oracle applies the same
   predicate). At web scale, suppress stop-tokens (df-capped blocking
   keys) before the sort — the token-df table is the same bounded
   aggregate as step 1.
3. **Scoring** — Levenshtein edit distance computed by a DP vectorized
   ACROSS PAIRS (numpy cube over padded char codes: O(Lmax^2) numpy
   ops on the whole pair batch, no per-pair Python DP), then the
   integer similarity gate ``100*(maxlen-lev) >= pct*maxlen``.

Output: one row per matched unordered pair (name_a < name_b) with the
edit distance, floor-integer similarity percent, and the per-name row
counts carried from the compression stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _lev_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Levenshtein distance for each (a[i], b[i]) pair, vectorized
    across the pair axis: a (La+1, Lb+1, n) DP cube over padded char
    codes — ~Lmax^2 numpy kernel steps total for the WHOLE batch.
    Padding (code 0) never equals a real char, and cell (la, lb) only
    depends on real-prefix cells, so per-pair answers read exactly at
    their true lengths."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((n, La), dtype=np.int32)
    B = np.zeros((n, Lb), dtype=np.int32)
    for i, s in enumerate(a):
        A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b):
        B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    dp = np.zeros((La + 1, Lb + 1, n), dtype=np.int32)
    dp[0, :, :] = np.arange(Lb + 1, dtype=np.int32)[:, None]
    dp[:, 0, :] = np.arange(La + 1, dtype=np.int32)[:, None]
    for i in range(1, La + 1):
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            dp[i, j] = np.minimum(
                np.minimum(dp[i - 1, j] + 1, dp[i, j - 1] + 1),
                dp[i - 1, j - 1] + cost,
            )
    return dp[la, lb, np.arange(n)].astype(np.int64)


def _explode_tokens(t: pa.Table) -> pa.Table:
    """(name, n_rows) -> one row per DISTINCT token of the name."""
    names = t.column("name").to_pylist()
    counts = t.column("n_rows").to_numpy(zero_copy_only=False)
    toks: list[str] = []
    out_names: list[str] = []
    out_counts: list[int] = []
    for nm, c in zip(names, counts):
        for tok in sorted(set(nm.split(" "))):
            toks.append(tok)
            out_names.append(nm)
            out_counts.append(int(c))
    return pa.Table.from_arrays(
        [
            pa.array(toks, pa.string()),
            pa.array(out_names, pa.string()),
            pa.array(out_counts, pa.int64()),
        ],
        names=["tok", "name", "n_rows"],
    )


def _pairs_in_runs(t: pa.Table) -> pa.Table:
    """Rows sorted by tok: emit every unordered within-run name pair
    (name_a < name_b), carrying both row counts. Vectorized per run
    via triu indices; the loop is over blocking-token RUNS (vocabulary-
    bounded), never over rows."""
    from ..query_utils import _run_starts_mask_arrow

    empty = pa.Table.from_arrays(
        [
            pa.array([], pa.string()),
            pa.array([], pa.string()),
            pa.array([], pa.int64()),
            pa.array([], pa.int64()),
        ],
        names=["name_a", "name_b", "n_rows_a", "n_rows_b"],
    )
    if t.num_rows == 0:
        return empty
    starts = np.flatnonzero(_run_starts_mask_arrow(t, ["tok"]))
    ends = np.append(starts[1:], t.num_rows)
    names = np.asarray(t.column("name").to_pylist(), dtype=object)
    counts = t.column("n_rows").to_numpy(zero_copy_only=False)
    ia_all: list[np.ndarray] = []
    ib_all: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        iu, ju = np.triu_indices(k, k=1)
        ia_all.append(iu + s)
        ib_all.append(ju + s)
    if not ia_all:
        return empty
    ia = np.concatenate(ia_all)
    ib = np.concatenate(ib_all)
    na, nb = names[ia], names[ib]
    swap = na > nb
    na2 = np.where(swap, nb, na)
    nb2 = np.where(swap, na, nb)
    ca = np.where(swap, counts[ib], counts[ia])
    cb = np.where(swap, counts[ia], counts[ib])
    return pa.Table.from_arrays(
        [
            pa.array(na2.tolist(), pa.string()),
            pa.array(nb2.tolist(), pa.string()),
            pa.array(ca, pa.int64()),
            pa.array(cb, pa.int64()),
        ],
        names=["name_a", "name_b", "n_rows_a", "n_rows_b"],
    )


def fuzzy_name_matches(ds, name_col: str, threshold_pct: int = 60):
    """Blocked fuzzy self-join over ``name_col`` of ``ds``.

    Returns a Dataset of (name_a, name_b, lev, sim_pct, n_rows_a,
    n_rows_b): unordered distinct-name pairs sharing >= 1 token whose
    integer similarity ``100*(maxlen-lev) >= threshold_pct*maxlen``.
    """
    import ray.data
    from ray.data.aggregate import Sum

    import pandas as pd

    from ..query_utils import _distinct_native, _preagg_native, _window_by_key_arrow

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(name_col, as_index=False).size()
        g.columns = ["name", "n_rows"]
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return g.rename(columns={"sum(n_rows)": "n_rows"})

    names = _preagg_native(ds, ["name"], partial, [Sum("n_rows")], finalize)

    exploded = names.map_batches(_explode_tokens, batch_format="pyarrow")
    # One sort by blocking token; complete runs per block via the
    # boundary side-channel; (name_a, name_b) dedup guards names whose
    # token sets overlap in more than one token.
    pairs = _window_by_key_arrow(
        exploded, ["tok"], ["tok", "name"], _pairs_in_runs
    )
    # The count columns are pure functions of the names, so DISTINCT
    # over all four columns == DISTINCT over the unordered pair.
    pairs = _distinct_native(
        pairs, ["name_a", "name_b", "n_rows_a", "n_rows_b"]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=["name_a", "name_b", "lev", "sim_pct",
                       "n_rows_a", "n_rows_b"],
            )
        a = t.column("name_a").to_pylist()
        b = t.column("name_b").to_pylist()
        lev = _lev_batch(a, b)
        maxlen = np.maximum(
            np.array([len(s) for s in a], dtype=np.int64),
            np.array([len(s) for s in b], dtype=np.int64),
        )
        keep = 100 * (maxlen - lev) >= threshold_pct * maxlen
        sim = (100 * (maxlen - lev)) // maxlen
        out = pa.Table.from_arrays(
            [
                t.column("name_a"),
                t.column("name_b"),
                pa.array(lev, pa.int64()),
                pa.array(sim, pa.int64()),
                t.column("n_rows_a"),
                t.column("n_rows_b"),
            ],
            names=["name_a", "name_b", "lev", "sim_pct",
                   "n_rows_a", "n_rows_b"],
        )
        return out.filter(pa.array(keep))

    return pairs.map_batches(score, batch_format="pyarrow").sort(
        ["name_a", "name_b"]
    )
