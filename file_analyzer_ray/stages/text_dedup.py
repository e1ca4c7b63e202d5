"""Near-duplicate detection over text tables: MinHash+LSH and n-gram
Jaccard clustering.

Standard public algorithms (Broder '97 MinHash; banding LSH per
Leskovec/Rajaraman/Ullman) expressed Ray-Data-first:

    map_batches(signatures)            # vectorized minhash per doc
      → flat band explode              # (band_key, doc_id, sig) rows
      → sort(band_key)                 # the ONE exchange, narrow rows
      → vectorized run-scan pairs      # no per-bucket dispatch
        (+ boundary side-channel for buckets straddling block edges)
      → exact-Jaccard verify           # driver-broadcast or
                                       # two-hash-join, chosen by size

Cluster assembly (connected components): driver union-find over the
verified pair set (provably small after thresholding) by default, or
:func:`cc_min_label_propagation` — iterative distributed min-label
rounds with only a convergence scalar on the driver — as the
10^12-scale path (equality-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import (
    MinHasher,
    char_shingle_hashes,
    char_shingle_hashes_batch,
    jaccard,
    word_ngram_hashes,
)
from ..functions.text import char_shingles, word_ngrams

_N_PERM = 64
_N_BANDS = 16  # 4 rows/band → recall ≈ 0.9998 at J = 0.8


_HASHER: MinHasher | None = None


def _hasher() -> MinHasher:
    """Module-level MinHasher (deterministic seed): constructing it is
    two tiny numpy draws, so signature computation runs as plain TASKS
    — an actor pool here would only add ~2 s of spin-up latency."""
    global _HASHER
    if _HASHER is None:
        _HASHER = MinHasher(num_perm=_N_PERM, seed=42)
    return _HASHER


class SignatureStage:
    """Per-batch minhash signatures. Shingle hashing is fully
    vectorized (``hash_fn`` returns a uint64 array per doc — no
    per-shingle Python objects in the hot path), and when a
    ``batch_hash_fn`` is supplied (the char-shingle default) the whole
    batch runs as ONE flat broadcast + ``minimum.reduceat`` — no
    per-doc numpy dispatch either. Plain callable usable as a task fn
    (see :func:`_hasher`)."""

    def __init__(self, hash_fn, batch_hash_fn=None):
        self.hash_fn = hash_fn
        self.batch_hash_fn = batch_hash_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        mh = _hasher()
        texts = batch.column("text").to_pylist()
        if self.batch_hash_fn is not None:
            flat, counts = self.batch_hash_fn(texts)
            mat = mh.signatures_from_flat(flat, counts)
            sigs = [mat[i].tobytes() for i in range(len(texts))]
        else:
            sigs = [
                mh.signature_from_hashes(self.hash_fn(t)).tobytes()
                for t in texts
            ]
        return batch.select(["doc_id", "text"]).append_column(
            "sig", pa.array(sigs, pa.binary())
        )


# splitmix64 finalizer constants — the band-key mixer below only needs
# "equal chunks → equal key" plus decent spread; cross-chunk collisions
# merely add candidates that the exact-Jaccard verify removes.
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _explode_bands(batch: pa.Table) -> pa.Table:
    """Band rows (band, doc_id, sig): text never crosses the candidate
    shuffle; the signature (512 B) rides along so buckets can prefilter
    pairs by estimated Jaccard before the exact verify. Fully
    vectorized: the batch's signatures form ONE (n, _N_PERM) uint64
    matrix and every band key comes from a splitmix64-style mix over
    that matrix — no per-doc Python loop, no per-band sha256 call
    (the old path paid 16 hashlib round-trips per document)."""
    n = batch.num_rows
    rows_per_band = _N_PERM // _N_BANDS
    sig_arr = batch.column("sig")
    if isinstance(sig_arr, pa.ChunkedArray):
        sig_arr = sig_arr.combine_chunks()
    mat = np.frombuffer(
        b"".join(sig_arr.to_pylist()), dtype=np.uint64
    ).reshape(n, _N_PERM)
    chunks = mat.reshape(n, _N_BANDS, rows_per_band)
    h = np.zeros((n, _N_BANDS), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            h = (h ^ chunks[:, :, j]) * _MIX1
            h ^= h >> np.uint64(29)
            h *= _MIX2
            h ^= h >> np.uint64(32)
    band_idx = np.arange(_N_BANDS, dtype=np.uint64)
    key = (band_idx[None, :] << np.uint64(48)) | (h & np.uint64((1 << 48) - 1))
    rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), _N_BANDS))
    return pa.Table.from_arrays(
        [
            pa.array(key.reshape(-1).astype(np.int64)),
            (
                batch.column("doc_id").combine_chunks()
                if isinstance(batch.column("doc_id"), pa.ChunkedArray)
                else batch.column("doc_id")
            ).take(rep),
            sig_arr.take(rep),
        ],
        names=["band", "doc_id", "sig"],
    )


def _make_bucket_candidates(threshold: float, est_margin: float = 0.15):
    """In-bucket pair generation with a vectorized signature-estimate
    prefilter: pairs whose estimated Jaccard (fraction of agreeing
    minhash components) is below threshold−margin never reach the
    exact verify — this is what keeps mega-buckets (a 600-clone
    cluster is C(600,2) raw pairs) from exploding the pair shuffle."""
    cutoff = threshold - est_margin

    def bucket_candidates(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_id_a": g["doc_id"].iloc[:0], "doc_id_b": g["doc_id"].iloc[:0]}
            )
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order]
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in g["sig"].to_numpy()[order]]
        )
        est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        keep = np.triu(est >= cutoff, k=1)
        r, c = np.nonzero(keep)
        return pd.DataFrame({"doc_id_a": ids[r], "doc_id_b": ids[c]})

    return bucket_candidates


def _first_pair(g: pd.DataFrame) -> pd.DataFrame:
    return g.iloc[:1]


def _run_bounds(bvals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of equal-value runs in a sorted array."""
    starts = np.flatnonzero(np.r_[True, bvals[1:] != bvals[:-1]])
    ends = np.r_[starts[1:], len(bvals)]
    return starts, ends


def _pairs_from_runs(ids, sigs_bytes, starts, ends, cutoff, id_type) -> pa.Table:
    """Estimate-prefiltered candidate pairs for the given bucket runs
    (vectorized per run; singleton runs cost one comparison, not a
    per-group frame)."""
    out_a: list = []
    out_b: list = []
    multi = (ends - starts) >= 2  # vectorized singleton skip
    for s, e in zip(starts[multi].tolist(), ends[multi].tolist()):
        idx = np.argsort(ids[s:e], kind="stable") + s
        rid = ids[idx]
        sig = np.stack([np.frombuffer(sigs_bytes[i], dtype=np.uint64) for i in idx])
        est = (sig[:, None, :] == sig[None, :, :]).mean(axis=2)
        keep = np.triu(est >= cutoff, k=1)
        r, c = np.nonzero(keep)
        out_a.extend(rid[r])
        out_b.extend(rid[c])
    return pa.Table.from_arrays(
        [pa.array(out_a, id_type), pa.array(out_b, id_type)],
        names=["doc_id_a", "doc_id_b"],
    )


def _lsh_candidate_pairs(docs, hash_fn, threshold: float,
                         batch_hash_fn=None) -> "ray.data.Dataset":
    """(doc_id, text) → candidate pair dataset via MinHash-LSH:
    vectorized signatures → (band, doc_id, sig) explode → ONE sort by
    band key → vectorized run-scan per sorted block.

    The co-grouping is a SORT + per-block numpy run detection, NOT
    ``groupby(band).map_groups``: with 16 bands/doc nearly every bucket
    is a singleton, and Ray/pandas per-group dispatch costs ~100 µs of
    empty-frame construction per group — measured 10 s for a 5k-doc
    corpus vs ~1 s for the run-scan. Buckets that straddle a block
    boundary are routed down a boundary side-channel (first/last band
    key of each block, a few rows per block) and paired in one extra
    small task; interior runs are paired in place. Pairs surfacing
    from several bands appear multiply; the verify step dedups them.
    """
    cutoff = threshold - 0.15  # see _make_bucket_candidates
    sigs = docs.map_batches(
        SignatureStage(hash_fn, batch_hash_fn),
        batch_format="pyarrow", batch_size=1024,
    )
    bands = sigs.map_batches(_explode_bands, batch_format="pyarrow")
    sorted_bands = bands.sort("band").materialize()

    def interior_pairs(t: pa.Table) -> pa.Table:
        b = t.column("band").to_numpy()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sb = t.column("sig").to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(b)
        # runs touching either block edge go to the boundary pass
        inner = (starts > 0) & (ends < len(b))
        return _pairs_from_runs(
            ids, sb, starts[inner], ends[inner], cutoff,
            t.schema.field("doc_id").type,
        )

    def boundary_rows(t: pa.Table) -> pa.Table:
        b = t.column("band").to_numpy()
        if not len(b):
            return t
        edge = (b == b[0]) | (b == b[-1])
        return t.filter(pa.array(edge))

    def boundary_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by("band")
        b = t.column("band").to_numpy()
        starts, ends = _run_bounds(b)
        return _pairs_from_runs(
            t.column("doc_id").to_numpy(zero_copy_only=False),
            t.column("sig").to_numpy(zero_copy_only=False),
            starts, ends, cutoff, t.schema.field("doc_id").type,
        )

    interior = sorted_bands.map_batches(
        interior_pairs, batch_format="pyarrow", batch_size=None
    )
    boundary = (
        sorted_bands.map_batches(boundary_rows, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(boundary_pairs, batch_format="pyarrow", batch_size=None)
    )
    return interior.union(boundary)


_DRIVER_VERIFY_MAX_PAIRS = 100_000


def _verify_pairs_exact(
    pairs, docs, shingle_fn, threshold: float, mode: str = "auto"
) -> "ray.data.Dataset":
    """Exact-Jaccard verify for the LSH candidates. Two paths, chosen
    from the MEASURED candidate count (``mode='auto'``):

    - ``driver`` (small candidate sets): collect the deduped pairs,
      fetch the texts of only the referenced docs with one broadcast
      semi-filter pass, verify distributed with the text map in the
      object store. Fastest for the common post-banding case (hundreds
      of pairs) — two fewer exchanges than the join path.
    - ``join`` (the scale path): candidate texts NEVER transit the
      driver — the deduped pair set hash-joins the (doc_id, text)
      corpus twice (left side then right side), and the verify kernel
      runs per batch over (text_a, text_b) rows. All-streaming; the
      only driver-side value is the candidate count.
    """
    import pyarrow as pa

    empty = pa.Table.from_pylist(
        [], schema=pa.schema([("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()),
                              ("jaccard", pa.float64())])
    )
    if mode == "auto":
        # the mode decision needs the measured candidate count — pay one
        # materialize. Callers that know the corpus row count up front
        # (parquet footer metadata) pass mode explicitly and skip this
        # barrier entirely (same static-choice pattern as _preagg_native).
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs == 0:
            return ray.data.from_arrow(empty)
        mode = "driver" if n_pairs <= _DRIVER_VERIFY_MAX_PAIRS else "join"

    if mode == "driver":
        pair_df = pairs.to_pandas().drop_duplicates(["doc_id_a", "doc_id_b"])
        if pair_df.empty:
            return ray.data.from_arrow(empty)
        need = set(pair_df["doc_id_a"]) | set(pair_df["doc_id_b"])
        need_ref = ray.put(need)
        texts = docs.map_batches(
            lambda df: df.loc[df["doc_id"].isin(ray.get(need_ref)), ["doc_id", "text"]],
            batch_format="pandas",
        ).to_pandas()
        text_ref = ray.put(dict(zip(texts["doc_id"], texts["text"])))

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            text_of = ray.get(text_ref)
            cache: dict = {}

            def sh(doc_id):
                if doc_id not in cache:
                    cache[doc_id] = set(shingle_fn(text_of[doc_id]))
                return cache[doc_id]

            rows = []
            for a, b in zip(df["doc_id_a"], df["doc_id_b"]):
                jac = jaccard(sh(a), sh(b))
                if jac >= threshold:
                    rows.append({"doc_id_a": a, "doc_id_b": b, "jaccard": jac})
            return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "jaccard"])

        return ray.data.from_pandas(pair_df).map_batches(verify, batch_format="pandas")

    # -- join path: dedup pairs natively, then two hash joins ------------
    # Join parallelism adapts to the cluster: each hash-join operator
    # holds num_partitions build shards, and TWO chained joins with
    # more total demand than the CPU count deadlock the streaming
    # executor on small clusters (measured at 4 CPUs with 16+16).
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_part = max(2, min(16, cpus // 2))
    from ..query_utils import _distinct_native

    deduped = _distinct_native(pairs, ["doc_id_a", "doc_id_b"])

    def rename_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id_a": df["doc_id"], "text_a": df["text"]})

    def rename_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id_b": df["doc_id"], "text_b": df["text"]})

    ja = deduped.join(
        docs.map_batches(rename_a, batch_format="pandas"),
        join_type="inner",
        num_partitions=n_part,
        on=("doc_id_a",),
        right_on=("id_a",),
    )
    jb = ja.join(
        docs.map_batches(rename_b, batch_format="pandas"),
        join_type="inner",
        num_partitions=n_part,
        on=("doc_id_b",),
        right_on=("id_b",),
    )

    def verify_joined(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b, ta, tb in zip(
            df["doc_id_a"], df["doc_id_b"], df["text_a"], df["text_b"]
        ):
            jac = jaccard(set(shingle_fn(ta)), set(shingle_fn(tb)))
            if jac >= threshold:
                rows.append({"doc_id_a": a, "doc_id_b": b, "jaccard": jac})
        return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "jaccard"])

    return jb.map_batches(verify_joined, batch_format="pandas")


#: below this input row count the verified-pair set cannot plausibly
#: exceed _DRIVER_VERIFY_MAX_PAIRS (the corpus plants ~1 near-dup per
#: 50 docs; even 1 pair per doc stays under the cap), so the verify
#: mode is decided statically and the candidate materialize-and-count
#: barrier is skipped.
_STATIC_DRIVER_VERIFY_MAX_ROWS = 50_000


def minhash_near_dup_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    shingle_k: int = 5,
    verify_mode: str = "auto",
    input_rows: "int | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, text) → verified near-dup pairs (doc_id_a, doc_id_b,
    jaccard). MinHash-LSH candidate generation (narrow shuffle),
    exact-Jaccard verification on the joined-back texts
    (``verify_mode``: auto | driver | join — see _verify_pairs_exact).
    Callers that know the corpus row count (free from parquet footer
    metadata) pass ``input_rows``: small corpora go straight to the
    driver verify with NO candidate count barrier, huge ones straight
    to the streaming join path."""
    shingle_fn = lambda t: char_shingles(t, shingle_k)  # noqa: E731
    hash_fn = lambda t: char_shingle_hashes(t, shingle_k)  # noqa: E731
    batch_fn = lambda ts: char_shingle_hashes_batch(ts, shingle_k)  # noqa: E731
    if verify_mode == "auto" and input_rows is not None:
        verify_mode = (
            "driver" if input_rows <= _STATIC_DRIVER_VERIFY_MAX_ROWS else "join"
        )
    pairs = _lsh_candidate_pairs(docs, hash_fn, threshold,
                                 batch_hash_fn=batch_fn)
    return _verify_pairs_exact(pairs, docs, shingle_fn, threshold, mode=verify_mode)


def simhash_near_dup_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3
) -> "ray.data.Dataset":
    """SimHash near-duplicate pairs (hamming ≤ ``max_hamming`` over the
    64-bit Charikar fingerprint). Pigeonhole banding: with 4 bands of
    16 bits, any pair within hamming 3 shares at least one identical
    band, so the band key is the ONE shuffle and recall is exactly 1.0;
    in-group pairs are verified with the true hamming distance."""
    from ..functions.hashing import simhash64
    from ..functions.text import tokenize

    def add_simhash(df: pd.DataFrame) -> pd.DataFrame:
        # dtype MUST be an explicit uint64: Python ints ≥ 2^63 in an
        # object column make the per-block Arrow conversion fall back
        # to lossy float64 for blocks that contain one — low fingerprint
        # bits silently round away and in-bucket hamming UNDERCOUNTS,
        # nondeterministically with block composition (caught by the
        # sf0.01 oracle at 16 CPUs).
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": np.fromiter(
                    (simhash64(tokenize(t.lower())) for t in df["text"]),
                    dtype=np.uint64,
                    count=len(df),
                ),
            }
        )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_doc, out_hash = [], [], []
        for doc_id, h in zip(df["doc_id"], df["simhash"]):
            h = int(h)
            for b in range(4):
                out_band.append((b << 16) | ((h >> (16 * b)) & 0xFFFF))
                out_doc.append(doc_id)
                out_hash.append(h)
        return pd.DataFrame(
            {
                "band": np.asarray(out_band, dtype=np.int64),
                "doc_id": out_doc,
                "simhash": np.asarray(out_hash, dtype=np.uint64),
            }
        )

    from ..query_utils import _distinct_native
    from .banding import banded_pairs, hamming_pair_kernel

    sigs = docs.map_batches(add_simhash, batch_format="pandas")
    bands = sigs.map_batches(explode, batch_format="pandas")
    pairs = banded_pairs(
        bands,
        hamming_pair_kernel("simhash", max_hamming),
        pa.schema([("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()),
                   ("hamming", pa.int64())]),
    )
    return _distinct_native(pairs, ["doc_id_a", "doc_id_b", "hamming"])


def cc_min_label_propagation(
    pairs: "ray.data.Dataset", max_iters: int = 50
) -> "ray.data.Dataset":
    """Distributed connected components over an edge dataset
    (doc_id_a, doc_id_b) → (doc_id, label) with label = min doc_id of
    the component. Iterative min-label propagation: each round unions
    the current (node, label) state with per-edge label messages in
    BOTH directions, then takes the min label per node with one sort +
    run-scan (no per-group Python, no joins). Rounds ∝ component
    diameter — near-dup clusters are dense (clone clusters are
    near-cliques), so convergence is fast; the loop stops when the
    global label sum stops changing (one tiny aggregate per round).

    This is the at-scale replacement for driver union-find: nothing
    ever materializes on the driver except the per-round convergence
    scalar."""
    from ..query_utils import _edge_key_mask

    edges = pairs.select_columns(["doc_id_a", "doc_id_b"]).materialize()

    def init_state(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["doc_id_a"], df["doc_id_b"]], ignore_index=True)
        # -1 tags adjacency rows in the propagation rounds; a negative
        # node id would alias the sentinel and corrupt its labels.
        if len(nodes) and nodes.min() < 0:
            raise ValueError("cc_min_label_propagation requires nonnegative node ids")
        return pd.DataFrame({"node": nodes, "label": nodes}).drop_duplicates()

    state = edges.map_batches(init_state, batch_format="pandas").materialize()

    def min_per_node(ds):
        s = ds.sort(["node", "label"]).materialize()

        def interior(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            keep = df.loc[~_edge_key_mask(df, ["node"])]
            return keep.drop_duplicates("node", keep="first").reset_index(drop=True)

        def boundary(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            return df.loc[_edge_key_mask(df, ["node"])]

        def boundary_min(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.sort_values(["node", "label"], kind="stable")
                .drop_duplicates("node", keep="first")
                .reset_index(drop=True)
            )

        b = (
            s.map_batches(boundary, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(boundary_min, batch_format="pandas", batch_size=None)
        )
        return s.map_batches(
            interior, batch_format="pandas", batch_size=None
        ).union(b).materialize()

    prev_sum = None
    for _ in range(max_iters):
        # label messages along edges need label(node): co-locate state
        # rows and edge endpoints by node with one sort, then each
        # node-run knows its label and forwards it to every neighbor.
        def edge_msgs(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": pd.concat(
                        [df["doc_id_a"], df["doc_id_b"]], ignore_index=True
                    ),
                    "nbr": pd.concat(
                        [df["doc_id_b"], df["doc_id_a"]], ignore_index=True
                    ),
                }
            )

        adj = edges.map_batches(edge_msgs, batch_format="pandas")

        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "nbr": -1, "label": df["label"]})

        def tag_adj(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "nbr": df["nbr"], "label": -1})

        combined = (
            state.map_batches(tag_state, batch_format="pandas")
            .union(adj.map_batches(tag_adj, batch_format="pandas"))
        )
        s = combined.sort(["node", "label"]).materialize()

        def forward(df: pd.DataFrame) -> pd.DataFrame:
            """Per complete node-run: adjacency rows carry label = -1
            and the single state row carries the node's current label
            (≥ 0), so ``max.reduceat`` over each run recovers the state
            label regardless of row order within the run. Emit
            (nbr, label) for each adjacency row plus (node, label) for
            the node itself. Requires nonnegative node ids — the -1
            sentinel in the label column would be indistinguishable
            from a real label otherwise (asserted at entry)."""
            if df.empty:
                return pd.DataFrame({"node": df["node"], "label": df["node"]})
            nodes = df["node"].to_numpy()
            labels = df["label"].to_numpy()
            nbrs = df["nbr"].to_numpy()
            starts = np.flatnonzero(np.r_[True, nodes[1:] != nodes[:-1]])
            ends = np.r_[starts[1:], len(nodes)]
            run_label = np.maximum.reduceat(labels, starts)  # the state row's label
            run_of = np.repeat(np.arange(len(starts)), ends - starts)
            my_label = run_label[run_of]
            is_adj = nbrs >= 0
            out_node = np.concatenate([nbrs[is_adj], nodes[starts]])
            out_label = np.concatenate([my_label[is_adj], run_label])
            return pd.DataFrame({"node": out_node, "label": out_label})

        def interior_fwd(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return forward(df)
            return forward(df.loc[~_edge_key_mask(df, ["node"])].reset_index(drop=True))

        def boundary_rows(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            return df.loc[_edge_key_mask(df, ["node"])]

        def boundary_fwd(df: pd.DataFrame) -> pd.DataFrame:
            return forward(
                df.sort_values(["node", "label"], kind="stable").reset_index(drop=True)
            )

        msgs = s.map_batches(
            interior_fwd, batch_format="pandas", batch_size=None
        ).union(
            s.map_batches(boundary_rows, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(boundary_fwd, batch_format="pandas", batch_size=None)
        )
        # _pin_blocks: cut the loop state's logical plan per round
        # (bare materialize compounds the union tree — see query_utils)
        from ..query_utils import _pin_blocks

        state = _pin_blocks(min_per_node(msgs))
        cur = state.map_batches(
            lambda df: pd.DataFrame({"s": [int(df["label"].sum())]}),
            batch_format="pandas", batch_size=None,
        ).to_pandas()["s"].sum()
        if cur == prev_sum:
            break
        prev_sum = cur
    return state



def _dedup_pairs(lo: np.ndarray, hi: np.ndarray):
    """Vectorized distinct over int64 pairs — full-range safe (no
    packing into one word, which would collide for ids ≥ 2³²)."""
    if len(lo) == 0:
        return lo, hi
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    return lo[keep], hi[keep]


def cc_star_contraction(
    pairs: "ray.data.Dataset", max_iters: int = 50
) -> "ray.data.Dataset":
    """Distributed connected components by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — same contract as
    :func:`cc_min_label_propagation` ((doc_id_a, doc_id_b) →
    (node, label), label = component min; equality-pinned in pytest)
    but O(log) rounds instead of rounds ∝ component DIAMETER: each
    round rewires every node's neighbors at the minimum of its closed
    neighborhood, halving path lengths, so a sparse high-diameter
    graph (the part co-occurrence giant component: diameter ~50 at
    sf0.01) converges in ~8 rounds where min-label propagation pays
    ~50 (measured 11 min → tens of seconds).

    Per round: ONE sort of the 2m-row adjacency expansion + a
    vectorized run-scan (minimum.reduceat) emitting the rewired
    edges — no joins, no driver state but the convergence scalar
    (a wraparound hash-sum of the canonical edge set)."""
    from ..query_utils import _window_by_key_arrow

    def init_edges(t: pa.Table) -> pa.Table:
        a = t.column("doc_id_a").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = t.column("doc_id_b").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(a) and min(a.min(), b.min()) < 0:
            raise ValueError("cc_star_contraction requires nonnegative node ids")
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        lo, hi = _dedup_pairs(lo, hi)  # per-batch combiner
        return pa.Table.from_arrays(
            [pa.array(lo, pa.int64()), pa.array(hi, pa.int64())],
            names=["u", "v"],
        )

    edges = pairs.map_batches(init_edges, batch_format="pyarrow").materialize()

    def expand(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["node", "nbr"],
        )

    _EMPTY_E = pa.schema([("u", pa.int64()), ("v", pa.int64())]).empty_table()

    def star_round(large: bool):
        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY_E
            node = t.column("node").to_numpy(zero_copy_only=False)
            nbr = t.column("nbr").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
            ends = np.r_[starts[1:], len(node)]
            # rows sorted by (node, nbr): run min is the first nbr
            m = np.minimum(nbr[starts], node[starts])
            run_of = np.repeat(np.arange(len(starts)), ends - starts)
            my_m = m[run_of]
            if large:
                # connect strictly larger neighbors to min(Γ⁺)
                mask = nbr > node
                out_a, out_b = nbr[mask], my_m[mask]
            else:
                # connect smaller neighbors AND the node itself to min(Γ⁺)
                mask = nbr < node
                out_a = np.concatenate([nbr[mask], node[starts]])
                out_b = np.concatenate([my_m[mask], m])
            keep = out_a != out_b
            out_a, out_b = out_a[keep], out_b[keep]
            lo, hi = np.minimum(out_a, out_b), np.maximum(out_a, out_b)
            lo, hi = _dedup_pairs(lo, hi)  # per-batch combiner
            return pa.Table.from_arrays(
                [pa.array(lo, pa.int64()), pa.array(hi, pa.int64())],
                names=["u", "v"],
            )

        return emit

    def edge_hash(ds: "ray.data.Dataset") -> int:
        # wraparound mixing hash-SUM over the (globally deduped) edge
        # set: addition is order- and partitioning-independent, so one
        # scalar per block leaves each task and the driver folds
        # #blocks-bounded partials
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"h": pa.array([0], pa.uint64())})
            lo = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
            hi = t.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (lo * np.uint64(0x9E3779B97F4A7C15)
                     + hi * np.uint64(0xC2B2AE3D27D4EB4F)) ^ (hi >> np.uint64(7))
                s = np.add.reduce(h) + np.uint64(len(h))
            return pa.table({"h": pa.array([int(s)], pa.uint64())})

        tot = np.uint64(0)
        for b in ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            with np.errstate(over="ignore"):
                for x in b.column("h").to_numpy(zero_copy_only=False):
                    tot = tot + np.uint64(x)
        return int(tot)

    from ..query_utils import _distinct_native, _pin_blocks

    prev = None
    for _ in range(max_iters):
        for large in (True, False):
            # the same rewired edge (v, m) is emitted by MANY node runs;
            # global dedup (one sort) keeps the next expansion lean and
            # makes the convergence hash a set hash, not a multiset one.
            # _pin_blocks (NOT bare materialize): loop state must cut
            # its logical plan or per-round planning compounds ×4
            edges = _pin_blocks(
                _distinct_native(
                    _window_by_key_arrow(
                        edges.map_batches(expand, batch_format="pyarrow"),
                        ["node"], ["node", "nbr"], star_round(large),
                    ),
                    ["u", "v"],
                )
            )
        cur = edge_hash(edges)
        if cur == prev:
            break
        prev = cur

    def labels_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("node", pa.int64()), ("label", pa.int64())]
            ).empty_table()
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        m = np.minimum(nbr[starts], node[starts])
        return pa.Table.from_arrays(
            [pa.array(node[starts], pa.int64()), pa.array(m, pa.int64())],
            names=["node", "label"],
        )

    return _window_by_key_arrow(
        edges.map_batches(expand, batch_format="pyarrow"),
        ["node"], ["node", "nbr"], labels_fn,
    )


def ngram_dedup_clusters(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    n: int = 3,
    assembly: str = "auto",
) -> "ray.data.Dataset":
    """Word n-gram Jaccard dedup clusters (size ≥ 2): LSH pairs →
    connected components. ``assembly='driver'`` runs union-find on the
    collected pairs; ``assembly='distributed'`` runs
    :func:`cc_min_label_propagation` + a sort/run-scan cluster
    assembly, with nothing but a convergence scalar on the driver —
    the 10^12-scale path (equality-tested against the driver path).
    ``'auto'`` (default) picks by the MEASURED verified-pair count
    (driver below 100k pairs, distributed above)."""
    shingle_fn = lambda t: word_ngrams(t, n)  # noqa: E731
    hash_fn = lambda t: word_ngram_hashes(t, n)  # noqa: E731
    cands = _lsh_candidate_pairs(docs, hash_fn, threshold)
    pairs = _verify_pairs_exact(cands, docs, shingle_fn, threshold)

    if assembly == "auto":
        pairs = pairs.materialize()
        assembly = (
            "driver" if pairs.count() <= _DRIVER_VERIFY_MAX_PAIRS else "distributed"
        )

    if assembly == "distributed":
        from ..query_utils import _window_by_key_arrow

        # star contraction (r5): O(log) rounds vs min-label's rounds
        # ∝ component diameter — near-dup clusters are usually dense,
        # but a CHAIN of near-dups (doc A ~ B ~ C ... with A !~ C) is
        # exactly the high-diameter case; identical labels
        # (equality-pinned in test_star_cc)
        labels = cc_star_contraction(pairs)

        def clusters_fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64()),
                     pa.array([], pa.list_(pa.int64()))],
                    names=["canonical_doc_id", "cluster_size", "member_ids"],
                )
            lab = t.column("label").to_numpy()
            node = t.column("node").to_numpy()
            starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
            ends = np.r_[starts[1:], len(lab)]
            sizes = ends - starts
            keep = sizes >= 2
            # rows arrive sorted by (label, node): each kept run is
            # already an ascending member list — assemble ALL lists with
            # one repeat-mask + ListArray offsets, no per-run Python.
            members = node[np.repeat(keep, sizes)]
            offsets = np.concatenate(([0], np.cumsum(sizes[keep])))
            return pa.Table.from_arrays(
                [
                    pa.array(lab[starts[keep]].astype(np.int64)),
                    pa.array(sizes[keep].astype(np.int64)),
                    pa.ListArray.from_arrays(
                        pa.array(offsets, pa.int32()),
                        pa.array(members.astype(np.int64)),
                    ),
                ],
                names=["canonical_doc_id", "cluster_size", "member_ids"],
            )

        return _window_by_key_arrow(labels, ["label"], ["label", "node"], clusters_fn)

    pair_rows = pairs.take_all()  # verified pairs only: provably small

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            ra, rb = sorted((ra, rb))
            parent[rb] = ra

    for r in pair_rows:
        union(r["doc_id_a"], r["doc_id_b"])
    clusters: dict = {}
    for d in parent:
        clusters.setdefault(find(d), []).append(d)
    rows = [
        {
            "canonical_doc_id": root,
            "cluster_size": len(members),
            "member_ids": sorted(members),
        }
        for root, members in sorted(clusters.items())
        if len(members) >= 2
    ]
    schema = pa.schema(
        [
            ("canonical_doc_id", pa.int64()),
            ("cluster_size", pa.int64()),
            ("member_ids", pa.list_(pa.int64())),
        ]
    )
    if rows and isinstance(rows[0]["canonical_doc_id"], str):
        schema = pa.schema(
            [
                ("canonical_doc_id", pa.string()),
                ("cluster_size", pa.int64()),
                ("member_ids", pa.list_(pa.string())),
            ]
        )
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))
