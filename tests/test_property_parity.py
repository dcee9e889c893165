"""Property-based oracle parity: hypothesis generates random predicate
trees and aggregation choices; the engine's filter_sql→groupby→agg_sql
must match DuckDB on the same parquet. The reference has no randomized
testing at all (SURVEY §5) — this is the rebuild's robustness margin:
it sweeps the predicate/agg surface the hand-written gates can't.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_SMOKE, canonicalize

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus"]

# literals chosen inside each column's range so predicates are selective
LITERALS = {
    "l_quantity": st.integers(1, 50),
    "l_extendedprice": st.integers(1000, 90000),
    "l_discount": st.sampled_from([0.01, 0.03, 0.05, 0.08]),
    "l_tax": st.sampled_from([0.01, 0.04, 0.07]),
}


@st.composite
def comparison(draw):
    col = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
    lit = draw(LITERALS[col])
    return f"{col} {op} {lit}"


@st.composite
def predicate(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(comparison())
    left = draw(predicate(depth=depth - 1))
    right = draw(predicate(depth=depth - 1))
    conj = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.booleans())
    expr = f"({left} {conj} {right})"
    return f"NOT {expr}" if neg else expr


@st.composite
def aggregation(draw):
    col = draw(st.sampled_from(NUM_COLS))
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    # sums of 2dp-grid money values: round at the grid (stability note
    # in __spark_entry__.py docstring)
    if fn == "sum":
        return f"round(sum({col}), 2) as agg_val"
    if fn == "count":
        return "count(*) as agg_val"
    return f"{fn}({col}) as agg_val"


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS "
                f"SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    return con


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicate(), agg=aggregation(), key=st.sampled_from(KEY_COLS))
def test_random_filter_agg_matches_duckdb(spark, qc, duck, pred, agg, key):
    ds = qc.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = canonicalize(
        ds.filter_sql(pred).groupby([key]).agg_sql(agg).collect())
    want = canonicalize(duck.execute(
        f"SELECT {key}, {agg.replace(' as ', ' AS ')} FROM lineitem "
        f"WHERE {pred} GROUP BY {key}").fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"pred={pred} agg={agg}"
    if not len(got):
        return
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            assert (a - b).abs().max() <= 1e-9, f"pred={pred} agg={agg} col={c}"
        else:
            assert (a == b).all(), f"pred={pred} agg={agg} col={c}"


ORDER_LITERALS = {
    "o_totalprice": st.integers(10000, 400000),
    "c_acctbal": st.integers(-500, 9000),
}


@st.composite
def join_predicate(draw):
    col = draw(st.sampled_from(list(ORDER_LITERALS)))
    op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
    return f"{col} {op} {draw(ORDER_LITERALS[col])}"


@pytest.fixture(scope="module")
def duck_oc(spark):
    con = duckdb.connect()
    for t in ["orders", "customer"]:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=join_predicate(),
       how=st.sampled_from(["inner", "semi", "anti"]),
       key=st.sampled_from(["c_mktsegment", "o_orderpriority"]))
def test_random_join_agg_matches_duckdb(spark, qc, duck_oc, pred, how, key):
    """Random equi-join (inner/semi/anti) + filter + count per key must
    match DuckDB. Semi/anti joins project the right side away, so the
    group key must come from the left for those shapes."""
    if how != "inner" and key == "o_orderpriority":
        key = "c_mktsegment"
    cust = qc.read_parquet(f"{SF_SMOKE}/customer.parquet")
    orders = qc.read_parquet(f"{SF_SMOKE}/orders.parquet")
    got = canonicalize(
        cust.join(orders, left_on="c_custkey", right_on="o_custkey", how=how)
        .filter_sql(pred if how == "inner" or pred.startswith("c_") else "TRUE")
        .groupby([key]).agg_sql("count(*) as cnt").collect())
    where = pred if how == "inner" or pred.startswith("c_") else "TRUE"
    if how == "inner":
        sql = (f"SELECT {key}, count(*) AS cnt FROM customer "
               f"JOIN orders ON c_custkey = o_custkey WHERE {where} "
               f"GROUP BY {key}")
    elif how == "semi":
        sql = (f"SELECT {key}, count(*) AS cnt FROM customer "
               f"WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
               f"AND {where} GROUP BY {key}")
    else:
        sql = (f"SELECT {key}, count(*) AS cnt FROM customer "
               f"WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
               f"AND {where} GROUP BY {key}")
    want = canonicalize(duck_oc.execute(sql).fetchdf())
    assert len(got) == len(want), f"pred={pred} how={how}"
    if len(got):
        for c in got.columns:
            assert (got[c] == want[c]).all(), f"pred={pred} how={how} col={c}"


@st.composite
def theta_condition(draw):
    """Random non-equi residual over the joined orders×customer schema."""
    lo = draw(st.integers(-50, 400))
    op = draw(st.sampled_from(["<", "<=", ">", ">="]))
    scale = draw(st.sampled_from([10, 50, 100]))
    return f"o_totalprice {op} c_acctbal * {scale} + {lo}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=theta_condition(), how=st.sampled_from(["inner", "semi"]))
def test_random_nonequi_join_matches_duckdb(spark, qc, duck_oc, cond, how):
    """join(condition=...) with random cross-column range residuals on
    top of the equi key must match DuckDB exactly."""
    orders = qc.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = qc.read_parquet(f"{SF_SMOKE}/customer.parquet")
    j = orders.join(cust, left_on="o_custkey", right_on="c_custkey",
                    condition=cond, how=how)
    got = j.count()
    want = duck_oc.execute(
        f"SELECT count(*) FROM orders "
        + (f"SEMI JOIN" if how == "semi" else "JOIN")
        + f" customer ON o_custkey = c_custkey AND {cond}").fetchone()[0]
    assert got == want, f"cond={cond} how={how}: {got} != {want}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(minutes=st.sampled_from([10, 30, 60, 120, 240]),
       agg=st.sampled_from(["count(*)", "round(sum(value), 4)",
                            "round(avg(value), 4)", "round(max(value), 4)"]))
def test_random_tumbling_window_matches_duckdb(spark, qc, minutes, agg):
    """Tumbling windows of random width x random agg over the events
    stream must match DuckDB's time_bucket formulation."""
    import __spark_entry__ as em
    from quokka_spark.windowtypes import TumblingWindow
    from conftest import duck_con
    ev = em._ts(qc, SF_SMOKE, "events", sorted_by="ts")
    win = TumblingWindow(f"{minutes}m", {"v": agg})
    got = canonicalize(
        ev.windowed_transform(win, by="user_id").df
        .select("user_id", "window_start", "v").toPandas())
    want = canonicalize(duck_con(SF_SMOKE).execute(f"""
        SELECT user_id,
               time_bucket(INTERVAL {minutes} MINUTES, CAST(ts AS TIMESTAMP)) AS window_start,
               {agg} AS v
        FROM events GROUP BY user_id, window_start""").fetchdf())
    assert len(got) == len(want), f"{minutes}m {agg}"
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            assert (a - b).abs().max() <= 1e-9, f"{minutes}m {agg} col={c}"
        else:
            assert (a == b).all(), f"{minutes}m {agg} col={c}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(trade_types=st.sampled_from([("purchase",), ("click",),
                                    ("purchase", "signup")]),
       quote_type=st.sampled_from(["view", "click"]))
def test_random_asof_matches_duckdb(spark, qc, trade_types, quote_type):
    """As-of joins over random event-type splits must match DuckDB's
    native ASOF LEFT JOIN (backward, allow-exact-match) row for row."""
    import numpy as np
    import __spark_entry__ as em
    from conftest import duck_con
    if quote_type in trade_types:
        return
    from pyspark.sql import functions as F
    ev = em._ts(qc, SF_SMOKE, "events", sorted_by="ts")
    tt = "', '".join(trade_types)
    trades = ev.filter_sql(f"event_type in ('{tt}')") \
               .select(["event_id", "ts", "user_id", "value"])
    quotes = ev.filter_sql(f"event_type = '{quote_type}'") \
               .select(["ts", "user_id", "value"])
    got = (trades.join_asof(quotes, on="ts", by="user_id").df
           .select("event_id", F.round("value_2", 6).alias("value_2"))
           .toPandas().sort_values("event_id").reset_index(drop=True))
    want = duck_con(SF_SMOKE).execute(f"""
        SELECT t.event_id, round(q.value, 6) AS value_2
        FROM (SELECT * FROM events WHERE event_type IN ('{tt}')) t
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = '{quote_type}') q
          ON t.user_id = q.user_id AND t.ts >= q.ts
        ORDER BY t.event_id""").fetchdf()
    assert len(got) == len(want)
    a = got["value_2"].to_numpy(dtype=float)
    b = want["value_2"].to_numpy(dtype=float)
    mask = ~(np.isnan(a) & np.isnan(b))
    assert np.allclose(a[mask], b[mask], atol=1e-9), (trade_types, quote_type)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(minutes=st.sampled_from([15, 30, 60, 180]))
def test_random_sliding_window_matches_duckdb(spark, qc, minutes):
    """Trailing windows of random width must match DuckDB's
    RANGE INTERVAL formulation (closed interval on both sides —
    the documented boundary choice)."""
    import __spark_entry__ as em
    from quokka_spark.windowtypes import SlidingWindow
    from conftest import duck_con
    ev = em._ts(qc, SF_SMOKE, "events", sorted_by="ts")
    win = SlidingWindow(f"{minutes}m", {"v": "round(sum(value), 4)"})
    got = canonicalize(
        ev.windowed_transform(win, by="user_id").df
        .select("user_id", "ts", "v").toPandas())
    want = canonicalize(duck_con(SF_SMOKE).execute(f"""
        SELECT user_id, ts,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL {minutes} MINUTES PRECEDING
                     AND CURRENT ROW), 4) AS v
        FROM events""").fetchdf())
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            assert (a - b).abs().max() <= 1e-9, f"{minutes}m col={c}"
        else:
            assert (a == b).all(), f"{minutes}m col={c}"


STR_METHODS = ["upper", "lower", "length"]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(meth=st.sampled_from(STR_METHODS),
       needle=st.sampled_from(["a", "e", "ing", "the", "z"]))
def test_random_str_namespace_matches_duckdb(spark, qc, meth, needle):
    """Expression-DSL .str methods over the documents table must match
    DuckDB's string functions (count per outcome keeps outputs small)."""
    from conftest import duck_con
    ds = qc.read_parquet(f"{SF_SMOKE}/documents.parquet")
    col = ds["text"].str
    if meth == "length":
        expr = col.length()
        sql = "length(text)"
    elif meth == "upper":
        expr = col.to_uppercase().str.contains(needle.upper())
        sql = f"contains(upper(text), '{needle.upper()}')"
    else:
        expr = col.to_lowercase().str.contains(needle)
        sql = f"contains(lower(text), '{needle}')"
    got = (ds.with_columns({"v": expr}).df
           .groupBy("v").count().toPandas()
           .sort_values("v").reset_index(drop=True))
    want = (duck_con(SF_SMOKE).execute(
        f"SELECT {sql} AS v, count(*) AS count FROM documents GROUP BY v "
        f"ORDER BY v").fetchdf())
    assert got["v"].tolist() == want["v"].tolist(), (meth, needle)
    assert got["count"].tolist() == want["count"].tolist(), (meth, needle)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(gap_minutes=st.sampled_from([5, 15, 45, 90, 360]))
def test_random_session_window_matches_duckdb(spark, qc, gap_minutes):
    """Session windows with random gap timeouts must match DuckDB's
    lag-cumsum sessionization."""
    import __spark_entry__ as em
    from quokka_spark.windowtypes import SessionWindow
    from conftest import duck_con
    ev = em._ts(qc, SF_SMOKE, "events", sorted_by="ts")
    win = SessionWindow(f"{gap_minutes}m",
                        {"n": "count(*)", "s": "round(sum(value), 4)"})
    got = canonicalize(
        ev.windowed_transform(win, by="user_id").df
        .select("user_id", "session_start", "n", "s").toPandas())
    want = canonicalize(duck_con(SF_SMOKE).execute(f"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTES
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT user_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n,
               round(sum(value), 4) AS s
        FROM numbered GROUP BY user_id, sid""").fetchdf())
    assert len(got) == len(want), gap_minutes
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            assert (a - b).abs().max() <= 1e-9, (gap_minutes, c)
        else:
            assert (a == b).all(), (gap_minutes, c)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(hop_minutes=st.sampled_from([30, 60, 120]),
       k=st.sampled_from([2, 3, 4]))
def test_random_hopping_window_matches_duckdb(spark, qc, hop_minutes, k):
    """Hopping windows with random hop and size=k*hop: each event lands
    in k windows (the UNION-ALL shift formulation in DuckDB)."""
    import __spark_entry__ as em
    from quokka_spark.windowtypes import HoppingWindow
    from conftest import duck_con
    ev = em._ts(qc, SF_SMOKE, "events", sorted_by="ts")
    win = HoppingWindow(f"{hop_minutes}m", f"{hop_minutes * k}m",
                        {"n": "count(*)"})
    got = canonicalize(
        ev.windowed_transform(win, by=[]).df
        .select("window_start", "n").toPandas())
    shifts = " UNION ALL ".join(
        f"SELECT time_bucket(INTERVAL {hop_minutes} MINUTES, "
        f"CAST(ts AS TIMESTAMP)) - {i} * (INTERVAL {hop_minutes} MINUTES)"
        f" AS ws FROM events" for i in range(k))
    want = canonicalize(duck_con(SF_SMOKE).execute(
        f"SELECT ws AS window_start, count(*) AS n FROM ({shifts}) "
        f"GROUP BY ws").fetchdf())
    assert len(got) == len(want), (hop_minutes, k)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all(), (hop_minutes, k)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(meth=st.sampled_from(["hour", "day", "month", "week", "weekday",
                             "minute"]))
def test_random_dt_namespace_matches_duckdb(spark, qc, meth):
    """Expression-DSL .dt extractors must match DuckDB part functions
    (counts per extracted value keep outputs small)."""
    from conftest import duck_con
    ds = qc.read_parquet(f"{SF_SMOKE}/events.parquet")
    expr = getattr(ds["ts"].dt, meth)()
    duck_fn = {"hour": "hour(ts)", "day": "day(ts)", "month": "month(ts)",
               "week": "weekofyear(ts)", "weekday": "isodow(ts)",
               "minute": "minute(ts)"}[meth]
    got = (ds.with_columns({"v": expr}).df
           .groupBy("v").count().toPandas()
           .sort_values("v").reset_index(drop=True))
    want = (duck_con(SF_SMOKE).execute(
        f"SELECT CAST({duck_fn} AS INT) AS v, count(*) AS count "
        f"FROM events GROUP BY v ORDER BY v").fetchdf())
    assert got["v"].tolist() == want["v"].tolist(), meth
    assert got["count"].tolist() == want["count"].tolist(), meth


@pytest.mark.parametrize("seed", [11, 42, 99])
def test_random_line_dedup_matches_bruteforce(spark, seed):
    """Randomized multi-line corpora vs a pure-Python reference of the
    global first-occurrence rule (blank lines always kept)."""
    import random
    from quokka_spark.functions.dedup import line_dedup
    rng = random.Random(seed)
    vocab = ["cookie notice", "real content", "menu", "footer", "",
             "unique %d" % seed, "subscribe now", "  spaced  "]
    docs = [(i, "\n".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 8))))
            for i in range(12)]
    # python reference
    seen, ref = set(), {}
    for did, text in docs:
        kept, dropped = [], 0
        for line in text.split("\n"):
            norm = line.strip().lower()
            if norm == "":
                kept.append(line)
            elif norm not in seen:
                seen.add(norm)
                kept.append(line)
            else:
                dropped += 1
        ref[did] = ("\n".join(kept), len(kept), dropped)
    out = line_dedup(spark.createDataFrame(
        docs, "doc_id long, text string")).collect()
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
           for r in out}
    assert got == ref


@pytest.mark.parametrize("seed,n", [(5, 3), (17, 4), (23, 5)])
def test_random_duplicated_spans_matches_bruteforce(spark, seed, n):
    """Randomized small-vocab corpora vs a pure-Python reference:
    count n-gram occurrences corpus-wide, mark positions whose n-gram
    repeats, merge overlapping fixed-length intervals."""
    import random
    from collections import Counter
    from quokka_spark.functions.dedup import duplicated_spans
    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(n - 1, 20))))
            for i in range(10)]
    counts = Counter()
    grams = {}
    for did, text in docs:
        ws = text.split(" ")
        g = [tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        grams[did] = g
        counts.update(g)
    ref = set()
    for did, g in grams.items():
        spans = [(i, i + n) for i, t in enumerate(g) if counts[t] >= 2]
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        ref |= {(did, s, e) for s, e in merged}
    out = duplicated_spans(spark.createDataFrame(
        docs, "doc_id long, text string"), n=n).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in out}
    assert got == ref


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_avro_roundtrip_fuzz(seed):
    """Random values through the avro_lite writer→reader must come
    back exactly (drives the codec the iceberg metadata layer rides)."""
    import random
    from quokka_spark.sources.avro_lite import (read_container,
                                                write_container)
    rng = random.Random(seed)
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "long"]},
        {"name": "d", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ]}
    recs = [{
        "l": rng.randint(-2**62, 2**62),
        "s": "".join(chr(rng.randint(32, 0x2FA0)) for _ in range(rng.randint(0, 20))),
        "o": None if rng.random() < 0.5 else rng.randint(-10**15, 10**15),
        "d": rng.uniform(-1e300, 1e300),
        "arr": [str(rng.random()) for _ in range(rng.randint(0, 5))],
        "m": {f"k{j}": rng.randint(-5, 5) for j in range(rng.randint(0, 4))},
    } for _ in range(rng.randint(1, 30))]
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        write_container(f.name, schema, recs)
        _, back = read_container(f.name)
    assert back == recs


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frac=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
       cap=st.integers(1, 30),
       salt=st.sampled_from(["", "a", "xyz"]))
def test_random_sampling_matches_duckdb(spark, frac, cap, salt):
    """hash_sample / stratified / cap_per_key with random rates, caps
    and salts: membership must hash-match DuckDB's identical
    expressions (the determinism contract the samplers sell)."""
    from quokka_spark.functions.sampling import (cap_per_key, hash_sample,
                                                 stratified_hash_sample)
    docs_path = f"{SF_SMOKE}/documents.parquet"
    docs = spark.read.parquet(docs_path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{docs_path}')")
    thr = format(int(frac * 16 ** 12), "012x")

    got = sorted(r["doc_id"] for r in
                 hash_sample(docs, "doc_id", frac, salt=salt)
                 .select("doc_id").collect())
    want = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE substring(md5('{salt}' || "
        f"CAST(doc_id AS VARCHAR)), 1, 12) < '{thr}'").fetchall())
    assert got == want

    got = sorted(r["doc_id"] for r in stratified_hash_sample(
        docs, "doc_id", "source", {"src1": frac}, default=1.0 - frac,
        salt=salt).select("doc_id").collect())
    thr2 = format(int((1.0 - frac) * 16 ** 12), "012x")
    want = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE substring(md5('{salt}' || "
        f"CAST(doc_id AS VARCHAR)), 1, 12) < "
        f"CASE WHEN source = 'src1' THEN '{thr}' ELSE '{thr2}' END")
        .fetchall())
    assert got == want

    got = sorted(r["doc_id"] for r in
                 cap_per_key(docs, "source", "doc_id", cap, salt=salt)
                 .select("doc_id").collect())
    want = sorted(r[0] for r in con.execute(
        f"WITH r AS (SELECT doc_id, row_number() OVER (PARTITION BY source "
        f"ORDER BY substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 12), "
        f"doc_id) AS rn FROM documents) "
        f"SELECT doc_id FROM r WHERE rn <= {cap}").fetchall())
    assert got == want
    con.close()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(bits=st.sampled_from([4, 6, 8, 12]),
       lo=st.integers(-1000, 0), span=st.integers(1, 100000))
def test_random_zorder_matches_python_reference(spark, bits, lo, span):
    """zorder_key's Morton interleave must equal a direct Python
    implementation of the same normalization over random ranges."""
    import numpy as np
    from pyspark.sql import functions as F
    from quokka_spark.plans.scaling import zorder_key
    n = 500
    rng = np.random.default_rng(bits * 31 + span)
    xs = rng.integers(lo, lo + span + 1, n)
    ys = rng.integers(0, 3 * span + 1, n)
    df = spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "rid long, x long, y long")
    got = {r["rid"]: r["zkey"]
           for r in zorder_key(df, ["x", "y"], bits=bits).collect()}
    top = (1 << bits) - 1

    def norm(v, mn, mx):
        if mx == mn:
            return 0
        raw = int(np.floor((float(v) - float(mn)) * float(top)
                           / (float(mx) - float(mn))))
        return min(max(raw, 0), top)

    mnx, mxx, mny, mxy = xs.min(), xs.max(), ys.min(), ys.max()
    for i, (x, y) in enumerate(zip(xs, ys)):
        nx, ny = norm(x, mnx, mxx), norm(y, mny, mxy)
        z = 0
        for b in range(bits):
            z |= ((nx >> b) & 1) << (2 * b)
            z |= ((ny >> b) & 1) << (2 * b + 1)
        assert got[i] == z, (i, x, y, got[i], z)


_TEXT_ALPHABET = st.sampled_from(
    list("ab c.#'\"\\%_()[]*+?^$|/-…") + ["的", "é", "ü", "\t", "\n", "🎉"])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.lists(_TEXT_ALPHABET, min_size=0, max_size=40)
                      .map("".join), min_size=1, max_size=8))
def test_random_text_through_portable_ops_matches_duckdb(spark, texts):
    """Random text — SQL quotes, regex metacharacters, CJK, emoji,
    tabs — through the engine-portable text ops must match DuckDB
    computing over the SAME rows (registered as a real table, no
    literal-embedding escapes to get wrong)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from quokka_spark.functions.text import char_entropy, token_count
    from quokka_spark.functions.sampling import hash_sample
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)

    got = {r["doc_id"]: (r["n"], r["e"]) for r in df.select(
        "doc_id", token_count("text").cast("bigint").alias("n"),
        char_entropy("text").alias("e")).collect()}
    want = {r[0]: (r[1], r[2]) for r in con.execute(r"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END,
               CASE WHEN length(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) = 0
                    THEN NULL ELSE round(-list_aggregate(
                 [len(list_filter(cs, x -> x = c)) / CAST(len(cs) AS DOUBLE)
                    * log2(len(list_filter(cs, x -> x = c))
                           / CAST(len(cs) AS DOUBLE))
                  FOR c IN list_sort(list_distinct(cs))], 'sum'), 6) END
        FROM (SELECT doc_id, text,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), '') AS cs
              FROM documents)""").fetchall()}
    assert got == want, (got, want)

    # deterministic sampling membership on arbitrary-text KEYS
    keyed = df.select(F.col("text").alias("k")).distinct()
    got_s = sorted(r["k"] for r in
                   hash_sample(keyed, "k", 0.5, salt="zz").collect())
    want_s = sorted(r[0] for r in con.execute(
        "SELECT DISTINCT text FROM documents "
        "WHERE substring(md5('zz' || CAST(text AS VARCHAR)), 1, 12) "
        "< '800000000000'").fetchall())
    assert got_s == want_s
    con.close()


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_clusters=st.integers(2, 6), dim=st.sampled_from([4, 8, 24]),
       k=st.integers(1, 7), noise=st.sampled_from([0.02, 0.3, 1.5]))
def test_random_ann_index_always_exact(spark, tmp_path_factory,
                                       n_clusters, dim, k, noise):
    """Property: whatever the cluster geometry (tight, loose, or
    basically uniform), fragment count, or k, the index-pruned top-k
    equals brute force over the full dataset — rank for rank."""
    import numpy as np
    from pyspark.sql import functions as F
    from quokka_spark.functions.ann_index import (ann_index_topk,
                                                  write_ann_index)
    from quokka_spark.functions.similarity import brute_force_topk
    rng = np.random.default_rng(n_clusters * 1000 + dim * 10 + k)
    dirs = rng.standard_normal((n_clusters, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for i in range(120):
        c = i % n_clusters
        v = dirs[c] + noise * rng.standard_normal(dim)
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path_factory.mktemp("annprop") / "idx")
    write_ann_index(df, path, "embedding", "vec_id",
                    n_fragments=min(5, n_clusters + 1))
    probes = df.filter(F.col("vec_id") < 3)
    info = {}
    got = (ann_index_topk(spark, path, probes, k, scan_info=info)
           .toPandas().sort_values(["probe_id", "rank"])
           .reset_index(drop=True))
    want = (brute_force_topk(df, probes, "embedding", k)
            .toPandas().sort_values(["probe_id", "rank"])
            .reset_index(drop=True))
    assert got["vec_id"].tolist() == want["vec_id"].tolist(), \
        (info, n_clusters, dim, k, noise)
    assert got["rank"].tolist() == want["rank"].tolist()


# ---------------------------------------------------------------------------
# BPE encode: the compiled replace-chain must equal the classic
# per-word array kernel (leftmost non-overlapping merge per rank) for
# RANDOM corpora and RANDOM realistic merge tables — including
# multi-char and '</w>'-right merges, adversarial repeats ('tttt'),
# and symbols that are prefixes/suffixes of each other (the
# boundary-bleed class the delimiter wrapping exists to kill).
# ---------------------------------------------------------------------------

def _ref_bpe_encode(text: str, merges: list) -> list:
    toks = []
    for w in text.lower().split():
        syms = list(w) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


@st.composite
def bpe_case(draw):
    alpha = "abt"
    words = st.text(alphabet=alpha, min_size=0, max_size=6)
    docs = draw(st.lists(st.lists(words, min_size=0, max_size=4),
                         min_size=1, max_size=8))
    texts = [" ".join(ws) for ws in docs]
    symbols = list(alpha)
    merges = []
    n_merges = draw(st.integers(min_value=0, max_value=10))
    for _ in range(n_merges):
        # left symbols ending in '</w>' are word-FINAL: real BPE
        # training never pairs them on the left (bpe_encode rejects
        # such tables — covered by the boundary unit test)
        lefts = [x for x in symbols if not x.endswith("</w>")]
        a = draw(st.sampled_from(lefts))
        b = draw(st.sampled_from(symbols + ["</w>"]))
        merges.append((a, b))
        symbols.append(a + b)
    return texts, merges


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=bpe_case())
def test_random_bpe_encode_matches_reference(spark, case):
    from quokka_spark.functions.packing import bpe_encode
    texts, merges = case
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: list(r["tokens"])
           for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_bpe_encode(t, merges), (t, merges)


def _ref_c4(text: str, min_words: int = 5):
    lines = text.split("\n")
    import re as _re
    kept = [x for x in lines
            if len(_re.split(r"\s+", x.strip())) >= min_words
            and _re.search(r'[.!?"\'”]$', x.strip())
            and "javascript" not in x.lower()]
    clean = "\n".join(kept)
    n_sent = len(_re.findall(r"[.!?]+", clean))
    has_brace = "{" in text
    has_lorem = "lorem ipsum" in text.lower()
    return (len(lines), len(kept), clean, n_sent, has_brace, has_lorem,
            n_sent >= 3 and not has_brace and not has_lorem)


@st.composite
def c4_doc(draw):
    word = st.sampled_from(["alpha", "beta", "x", "javascript", "lorem",
                            "ipsum", "{", "#", ""])
    line_end = st.sampled_from([".", "!", "?", '"', "'", "", " ", "..."])
    lines = draw(st.lists(
        st.tuples(st.lists(word, min_size=0, max_size=8), line_end),
        min_size=0, max_size=6))
    return "\n".join(" ".join(ws) + e for ws, e in lines)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(c4_doc(), min_size=1, max_size=8))
def test_random_c4_filter_matches_reference(spark, docs):
    from quokka_spark.functions.text import c4_filter_columns
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           sdf.select("doc_id", *c4_filter_columns("text")).collect()}
    for i, t in enumerate(docs):
        nl, nk, clean, ns, hb, hl, keep = _ref_c4(t)
        r = got[i]
        assert (r["n_lines"], r["n_kept"], r["clean_text"]) == (nl, nk, clean), t
        assert (r["n_sentences"], r["has_brace"], r["has_lorem"],
                r["c4_keep"]) == (ns, hb, hl, keep), t
