"""Property-based tests for the warehouse operators: SCD2 vs a
brute-force reference, upsert-merge vs latest-wins, Morton key vs the
bit-twiddling reference, CMS one-sidedness on adversarial streams."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import warehouse as W
from c3dc_etl_spark.streaming.upsert import read_snapshot, upsert_latest

SETTINGS = dict(max_examples=10, deadline=None)

# (key, ts, attr) logs with deliberate key/ts collisions
LOG = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=20),
        st.sampled_from(["x", "y", "z"]),
    ),
    min_size=1,
    max_size=30,
)


def _brute_scd2(rows):
    out = []
    by_key: dict[int, list] = {}
    for k, ts, a in rows:
        by_key.setdefault(k, []).append((ts, a))
    for k, evs in by_key.items():
        evs.sort()
        runs = []
        for ts, a in evs:
            if not runs or runs[-1][1] != a:
                runs.append([ts, a])
        for i, (ts, a) in enumerate(runs):
            eff_to = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, i + 1, a, ts, eff_to, int(eff_to is None)))
    return sorted(out)


@given(log=LOG)
@settings(**SETTINGS)
def test_scd2_matches_bruteforce(spark, log):
    # unique tiebreak: sequence index; brute force sorts by (ts, idx)
    rows = [(k, ts * 100 + i, a) for i, (k, ts, a) in enumerate(log)]
    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    got = sorted(
        tuple(r)
        for r in W.build_scd2(
            df, key_col="k", ts_col="ts", tiebreak_col="ts", attr_col="attr"
        ).collect()
    )
    expect = _brute_scd2([(k, ts, a) for k, ts, a in rows])
    assert got == expect


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),
                st.integers(min_value=0, max_value=50),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=6, deadline=None)
def test_upsert_matches_latest_wins(spark, batches):
    base = tempfile.mkdtemp(prefix="ups_prop_")
    snap = os.path.join(base, "snapshot")
    best: dict[int, int] = {}
    for bi, batch in enumerate(batches):
        rows = [(k, ver, f"p{bi}") for k, ver in batch]
        df = spark.createDataFrame(rows, "k long, ver long, payload string")
        upsert_latest(df, snap, key_cols=["k"], order_cols=["ver", "payload"])
        for k, ver in batch:
            cur = best.get(k)
            cand = (ver, f"p{bi}")
            if cur is None or cand > cur:
                best[k] = cand
    got = {
        r["k"]: (r["ver"], r["payload"])
        for r in read_snapshot(spark, snap).collect()
    }
    assert got == best


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_morton_matches_reference(spark, pts):
    def ref(x, y):
        out = 0
        for i in range(8):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", W.morton_key(F.col("x"), F.col("y")).alias("m")
    )
    for r in df.collect():
        assert r["m"] == ref(r["x"], r["y"])


@given(
    toks=st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=60)
)
@settings(**SETTINGS)
def test_cms_never_underestimates(spark, toks):
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    sketch = W.cms_sketch(df, "token", depth=2, width=4)
    probes = df.distinct()
    est = {
        r["token"]: r["est_count"]
        for r in W.cms_estimate(sketch, probes, "token", depth=2, width=4).collect()
    }
    from collections import Counter

    exact = Counter(toks)
    for t, n in exact.items():
        assert est[t] >= n
