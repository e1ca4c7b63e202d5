"""Sequence-packing plan: serial-oracle equality + coverage invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _serial_plan(doc_ids, n_tokens, seq_len):
    """Reference concat-and-cut: walk the token stream doc by doc."""
    seqs = []
    cur = {"docs": [], "starts": [], "ends": [], "fill": 0}

    def flush():
        seqs.append(dict(cur))
        cur["docs"], cur["starts"], cur["ends"], cur["fill"] = [], [], [], 0

    for d, nt in zip(doc_ids, n_tokens):
        remaining = nt + 1  # +1 EOS
        while remaining:
            space = seq_len - cur["fill"]
            take = min(space, remaining)
            cur["docs"].append(d)
            cur["starts"].append(cur["fill"])
            cur["ends"].append(cur["fill"] + take)
            cur["fill"] += take
            remaining -= take
            if cur["fill"] == seq_len:
                flush()
    if cur["docs"]:
        flush()
    return seqs


def test_pack_plan_matches_serial_oracle(ray_session):
    import ray.data

    from file_analyzer_ray.functions.text import bpe_token_count
    from file_analyzer_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(7)
    n = 400
    texts = [
        " ".join(f"w{rng.integers(0, 1000)}" for _ in range(rng.integers(1, 120)))
        for _ in range(n)
    ]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})
    seq_len = 256

    out = (
        pack_sequences(ray.data.from_pandas(df).repartition(1), seq_len=seq_len)
        .to_pandas()
        .sort_values("seq_index")
        .reset_index(drop=True)
    )
    counts = [bpe_token_count(t) for t in texts]
    exp = _serial_plan(df["doc_id"].tolist(), counts, seq_len)

    assert len(out) == len(exp)
    for i, e in enumerate(exp):
        row = out.iloc[i]
        assert list(row["doc_ids"]) == e["docs"]
        assert list(row["starts"]) == e["starts"]
        assert list(row["ends"]) == e["ends"]
    # pad only on the final sequence; all others exactly full
    assert (out["n_pad"].iloc[:-1] == 0).all()
    assert out["n_tokens"].iloc[-1] + out["n_pad"].iloc[-1] == seq_len


def test_pack_plan_block_invariants(ray_session):
    """Under any block split: every doc's (token_count+1) stream tokens
    are covered exactly once across all sequences; windows are within
    [0, seq_len]; per-block plans are deterministic (stable seq ids)."""
    import ray.data

    from file_analyzer_ray.functions.text import bpe_token_count
    from file_analyzer_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(13)
    n = 300
    texts = [
        " ".join(f"t{rng.integers(0, 500)}" for _ in range(rng.integers(0, 80)))
        for _ in range(n)
    ]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})
    counts = {i: bpe_token_count(t) + 1 for i, t in enumerate(texts)}
    seq_len = 128

    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = pack_sequences(ds, seq_len=seq_len).to_pandas()
        covered: dict[int, int] = {}
        for _, row in out.iterrows():
            assert 0 < row["n_tokens"] <= seq_len
            for d, s, e in zip(row["doc_ids"], row["starts"], row["ends"]):
                assert 0 <= s < e <= seq_len
                covered[d] = covered.get(d, 0) + (e - s)
        assert covered == counts
        # determinism: same split → identical plan
        again = pack_sequences(ds, seq_len=seq_len).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values(["seq_id"]).reset_index(drop=True),
            again.sort_values(["seq_id"]).reset_index(drop=True),
        )


def test_chunk_documents_windows(ray_session):
    import pandas as pd

    import ray.data

    from file_analyzer_ray.stages.packing import chunk_documents

    texts = {
        1: " ".join(f"t{i}" for i in range(10)),  # 10 toks
        2: "a b c",                               # < window: one chunk
        3: "",                                    # empty: one empty chunk
    }
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ).repartition(2)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_text"])
         for r in chunk_documents(ds, window=4, stride=3).take_all())
    )
    exp = [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),  # reaches the end -> stop
        (2, 0, 0, 3, "a b c"),
        (3, 0, 0, 0, ""),
    ]
    assert rows == exp
    # coverage invariant on a longer doc: every token index falls in
    # at least one window; consecutive windows overlap by window-stride
    long = " ".join(f"w{i}" for i in range(257))
    ds2 = ray.data.from_pandas(pd.DataFrame({"doc_id": [9], "text": [long]}))
    got = sorted(
        (r["start_tok"], r["n_tok"])
        for r in chunk_documents(ds2, window=64, stride=48).take_all()
    )
    covered = set()
    for s, n in got:
        covered |= set(range(s, s + n))
    assert covered == set(range(257))
    assert got[-1][0] + got[-1][1] == 257
