"""Approximate nearest-neighbor search over an embedding column.

Two paths (new first-class capability for the training-data surface):

- brute-force cosine top-k (queries.py q_embeddings_knn): broadcast the
  query vector, numpy matmul per batch, global sort+limit — the exact
  baseline and the oracle for recall tests;
- IVF (this module): a deterministic k-means coarse quantizer trained
  once on the driver from a sample, broadcast via ``ray.put``; each scan
  batch assigns its vectors to cells and only vectors in the ``n_probe``
  cells nearest the query are scored. At 10^12 scale the train step
  samples (``ds.random_sample``) and the per-cell routing becomes the
  partition key for a bucketed layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def kmeans_fit(x: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means (seeded init, fixed iterations)."""
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_vec_id: int = 0,
) -> "ray.data.Dataset":
    """Top-k cosine neighbors of ``query_vec_id``'s embedding, probing
    only the nearest ``n_probe`` IVF cells."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.array(
        tab.filter(pc.equal(tab["vec_id"], query_vec_id))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    # Train the coarse quantizer on a bounded sample (driver-side).
    sample = np.stack(tab["embedding"].slice(0, 2048).to_pylist()).astype(np.float64)
    centroids = kmeans_fit(sample, n_centroids)
    qn = qvec / np.linalg.norm(qvec)
    probe_cells = np.argsort(((centroids - qvec) ** 2).sum(axis=1))[:n_probe]
    ref = ray.put((qn, centroids, set(int(c) for c in probe_cells)))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q, cents, cells = ray.get(ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        keep = np.array([a in cells for a in assign])
        keep &= (df["vec_id"] != query_vec_id).to_numpy()
        if not keep.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cosine_sim": pd.Series([], dtype="float64")})
        mat = mat[keep]
        sims = (mat @ q) / np.linalg.norm(mat, axis=1)
        out = pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy()[keep], "cosine_sim": np.round(sims, 4)}
        )
        # per-batch partial top-k before the global sort
        return out.nlargest(k, "cosine_sim")

    scored = ds.map_batches(score, batch_format="pandas")
    return scored.sort(["cosine_sim", "vec_id"], descending=[True, False]).limit(k)
