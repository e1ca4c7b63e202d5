"""Repetition quality filter vs a DuckDB oracle (in-repo oracle: the
driver registry is at its 50-entry cap). The oracle recomputes every
signal — tokenizer, n-gram construction, fraction rounding and the
threshold rule — in SQL over the same parquet.

Observed signal distribution on the synthetic corpus (sf0.001):
dup_word p50 0.55 / max 0.72, top_bigram max 0.14, dup_trigram max
0.04 — the default thresholds (0.65 / 0.10 / 0.01) flag a strict
subset, exercised below."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"

SQL = """
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                        t -> lower(t)) AS tk
  FROM documents
),
base AS (
  SELECT doc_id, len(tk) AS n_tokens,
         CASE WHEN len(tk) = 0 THEN 0.0
              ELSE round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE)/len(tk), 6)
         END AS dup_word_frac
  FROM toks
),
bi AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks)
),
bi_top AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE)/sum(c), 6) AS top_bigram_frac
  FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM toks)
),
tri_dup AS (
  SELECT doc_id,
         round(1.0 - CAST(count(DISTINCT g) AS DOUBLE)/count(*), 6) AS dup_trigram_frac
  FROM tri GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.dup_word_frac,
       coalesce(bt.top_bigram_frac, 0.0) AS top_bigram_frac,
       coalesce(td.dup_trigram_frac, 0.0) AS dup_trigram_frac,
       (b.dup_word_frac > 0.65 OR coalesce(bt.top_bigram_frac, 0.0) > 0.10
        OR coalesce(td.dup_trigram_frac, 0.0) > 0.01) AS flagged
FROM base b
LEFT JOIN bi_top bt USING (doc_id)
LEFT JOIN tri_dup td USING (doc_id)
"""


def test_repetition_filter_matches_duckdb(ray_session):
    import ray.data

    from file_analyzer_ray.stages.repetition import repetition_filter

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    got = (
        repetition_filter(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.execute(SQL).df().sort_values("doc_id").reset_index(drop=True)
    exp = exp.astype(
        {"doc_id": "int64", "n_tokens": "int64", "flagged": "bool"}
    )
    pd.testing.assert_frame_equal(got, exp)
    assert got["flagged"].any() and not got["flagged"].all()


def test_repetition_filter_hand_cases(ray_session):
    import ray.data

    from file_analyzer_ray.stages.repetition import repetition_filter

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "spam spam spam spam spam spam",          # all three fire
                # clean doc long enough that 1/(n-1) < top-bigram
                # threshold (short docs naturally max out the fraction)
                "one two three four five six seven eight nine ten "
                "eleven twelve thirteen fourteen fifteen sixteen",
                "",                                       # empty → all zero
                "ab ab cd cd ab ab cd cd ab ab cd cd",    # trigram dup fires
            ],
        }
    )
    out = (
        repetition_filter(ray.data.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "flagged"]) and out.loc[1, "dup_word_frac"] > 0.8
    assert not bool(out.loc[2, "flagged"])
    assert out.loc[3].tolist() == [0, 0.0, 0.0, 0.0, False]
    assert bool(out.loc[4, "flagged"]) and out.loc[4, "dup_trigram_frac"] > 0.5
