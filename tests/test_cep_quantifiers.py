"""CEP quantifier semantics ("+", "*", "?") vs an independent
brute-force recursive matcher (reference cep_executors.py:131-170 is
the all-"1" base; quantifiers are the repo's MATCH_RECOGNIZE-style
parity-plus surface, operators/cep.py CompiledPattern docstring).

The brute force implements the documented contract from scratch —
reluctant matching under earliest-first DFS: skip ("*"/"?") is
preferred over binding, advancing is preferred over looping ("+"/"*"),
candidates explored earliest-first, one match per start row, dependent
predicates see the LATEST bound instance of a quantified event."""

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMOKE  # noqa: F401  (spark/qc fixtures' module)


def brute_force_quant(pdf: pd.DataFrame, events, maxspan: float,
                      time_col: str = "ts_sec"):
    """events: list of (name, pred_fn(row, bound_idx, rows) -> bool,
    quant). Returns [(first_ts, last_ts), ...], one per matched start."""
    rows = pdf.sort_values(time_col).reset_index(drop=True)
    n = len(rows)
    out = []
    n_levels = len(events)

    for i in range(n):
        name0, pred0, q0 = events[0]
        b0 = {name0: i}
        if not pred0(rows.iloc[i], b0, rows):
            continue
        horizon = rows.iloc[i][time_col] + maxspan

        def rec(level, after, bound, entered):
            name, pred, q = events[level]
            is_last = level == n_levels - 1
            if not entered and q in ("*", "?"):
                r = rec(level + 1, after, bound, False)
                if r is not None:
                    return r
            for j in range(after + 1, n):
                if rows.iloc[j][time_col] > horizon:
                    break
                nb = dict(bound)
                nb[name] = j
                if not pred(rows.iloc[j], nb, rows):
                    continue
                if is_last:
                    return j
                r = rec(level + 1, j, nb, False)
                if r is not None:
                    return r
                if q in ("+", "*"):
                    r = rec(level, j, nb, True)
                    if r is not None:
                        return r
            return None

        r = rec(1, i, b0, False)
        if r is None and q0 == "+":
            r = rec(0, i, b0, True)
        if r is not None:
            out.append((rows.iloc[i][time_col], rows.iloc[r][time_col]))
    return out


def _is(t):
    return lambda r, b, rows: r.event_type == t


# (engine event spec, brute-force event spec) pairs
PATTERNS = {
    "star_mid": (
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "*"),
         ("c", "c.event_type = 'purchase'")],
        [("a", _is("signup"), "1"),
         ("b", _is("click"), "*"),
         ("c", _is("purchase"), "1")]),
    "plus_dep_latest": (
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click' and b.value > a.value", "+"),
         ("c", "c.event_type = 'purchase' and c.value > b.value")],
        [("a", _is("signup"), "1"),
         ("b", lambda r, b, rows: r.event_type == "click"
          and r.value > rows.iloc[b["a"]].value, "+"),
         ("c", lambda r, b, rows: r.event_type == "purchase"
          and r.value > rows.iloc[b["b"]].value, "1")]),
    # the exact shape of the ts_cep_plus_dep driver gate: plain '+'
    # click, purchase above the LATEST bound click
    "plus_plain_dep": (
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "+"),
         ("c", "c.event_type = 'purchase' and c.value > b.value")],
        [("a", _is("signup"), "1"),
         ("b", _is("click"), "+"),
         ("c", lambda r, b, rows: r.event_type == "purchase"
          and r.value > rows.iloc[b["b"]].value, "1")]),
    "opt_mid": (
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "?"),
         ("c", "c.event_type = 'purchase'")],
        [("a", _is("signup"), "1"),
         ("b", _is("click"), "?"),
         ("c", _is("purchase"), "1")]),
    "plus_first": (
        [("a", "a.event_type = 'signup'", "+"),
         ("c", "c.event_type = 'purchase'")],
        [("a", _is("signup"), "+"),
         ("c", _is("purchase"), "1")]),
    "mixed_chain": (
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "*"),
         ("c", "c.event_type = 'view'", "?"),
         ("d", "d.event_type = 'purchase'", "+")],
        [("a", _is("signup"), "1"),
         ("b", _is("click"), "*"),
         ("c", _is("view"), "?"),
         ("d", _is("purchase"), "+")]),
}


def _random_stream(rng, n):
    return pd.DataFrame({
        "user_id": [1] * n,
        "ts_sec": np.sort(rng.choice(np.arange(n * 3, dtype="float64"),
                                     size=n, replace=False)),
        "event_type": rng.choice(
            ["signup", "click", "purchase", "view"], size=n,
            p=[0.3, 0.3, 0.25, 0.15]),
        "value": rng.randint(0, 8, size=n).astype("float64"),
    })


@pytest.mark.parametrize("pat_name", sorted(PATTERNS))
def test_quantified_kernel_matches_brute_force(pat_name):
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    engine_events, brute_events = PATTERNS[pat_name]
    rng = np.random.RandomState(hash(pat_name) % (2**31))
    schema = ["user_id", "ts_sec", "event_type", "value"]
    total = 0
    for trial in range(40):
        n = int(rng.randint(4, 40))
        pdf = _random_stream(rng, n)
        maxspan = float(rng.choice([5.0, 20.0, float(3 * n)]))
        pattern = CompiledPattern(schema, engine_events, "ts_sec", maxspan)
        got = match_pattern_pandas(pdf, pattern)
        want = brute_force_quant(pdf, brute_events, maxspan)
        assert got == want, (
            f"{pat_name} trial {trial} maxspan={maxspan}:\n"
            f"got={got}\nwant={want}\n{pdf.to_string()}")
        total += len(want)
    assert total > 0, f"{pat_name}: no matches in 40 trials — vacuous"


def test_star_zero_occurrence_hand_case():
    """The round-6 verdict failure scenario: A, B*, C on rows [A, C]
    must match (zero-or-more B), and did not before quantifier
    execution landed."""
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    pdf = pd.DataFrame({
        "user_id": [1, 1],
        "ts_sec": [0.0, 5.0],
        "event_type": ["signup", "purchase"],
        "value": [1.0, 2.0]})
    pattern = CompiledPattern(
        ["user_id", "ts_sec", "event_type", "value"],
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "*"),
         ("c", "c.event_type = 'purchase'")],
        "ts_sec", 100.0)
    assert match_pattern_pandas(pdf, pattern) == [(0.0, 5.0)]


def test_plus_binds_multiple_and_dep_sees_latest():
    """A, B+ (b.value > a.value), C (c.value > b.value): with clicks
    valued 5 then 2, the single-click paths fail C's predicate for
    b=5 (no purchase > 5) but succeed for b=2 — earliest-first tries
    b1=5 (fails), then b1-loop (5,2 → latest 2, purchase 3 > 2 ✓)."""
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    pdf = pd.DataFrame({
        "user_id": [1] * 4,
        "ts_sec": [0.0, 1.0, 2.0, 3.0],
        "event_type": ["signup", "click", "click", "purchase"],
        "value": [1.0, 5.0, 2.0, 3.0]})
    pattern = CompiledPattern(
        ["user_id", "ts_sec", "event_type", "value"],
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click' and b.value > a.value", "+"),
         ("c", "c.event_type = 'purchase' and c.value > b.value")],
        "ts_sec", 100.0)
    assert match_pattern_pandas(pdf, pattern) == [(0.0, 3.0)]


def test_plus_reluctant_prefers_single_bind():
    """With one qualifying click and two purchases, the match ends at
    the FIRST purchase after the first click (fewest repetitions,
    earliest completion) — not after consuming more clicks."""
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    pdf = pd.DataFrame({
        "user_id": [1] * 5,
        "ts_sec": [0.0, 1.0, 2.0, 3.0, 4.0],
        "event_type": ["signup", "click", "purchase", "click", "purchase"],
        "value": [1.0, 2.0, 9.0, 8.0, 9.0]})
    pattern = CompiledPattern(
        ["user_id", "ts_sec", "event_type", "value"],
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "+"),
         ("c", "c.event_type = 'purchase'")],
        "ts_sec", 100.0)
    assert match_pattern_pandas(pdf, pattern) == [(0.0, 2.0)]


def test_quantifier_structural_asserts():
    from quokka_spark.operators.cep import CompiledPattern
    schema = ["user_id", "ts_sec", "event_type", "value"]
    with pytest.raises(AssertionError):  # skippable first event
        CompiledPattern(schema, [("a", "a.value > 1", "*"),
                                 ("b", "b.value > 2")], "ts_sec", 10.0)
    with pytest.raises(AssertionError):  # skippable last event
        CompiledPattern(schema, [("a", "a.value > 1"),
                                 ("b", "b.value > 2", "?")], "ts_sec", 10.0)
    with pytest.raises(AssertionError):  # dep reference to skippable
        CompiledPattern(schema,
                        [("a", "a.value > 1"),
                         ("b", "b.value > 2", "*"),
                         ("c", "c.value > b.value")], "ts_sec", 10.0)
    with pytest.raises(AssertionError):  # unknown quantifier
        CompiledPattern(schema, [("a", "a.value > 1", "2")],
                        "ts_sec", 10.0)


def test_plus_no_match_bounded():
    """Adversarial blowup guard: a '+' level with hundreds of
    candidates and NO final event must exhaust in polynomial time —
    the visited-set collapses the 2^k repetition histories."""
    import time
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    n = 400
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts_sec": np.arange(n, dtype="float64"),
        "event_type": ["signup"] + ["click"] * (n - 1),
        "value": np.arange(n, dtype="float64")})
    pattern = CompiledPattern(
        ["user_id", "ts_sec", "event_type", "value"],
        [("a", "a.event_type = 'signup'"),
         ("b", "b.event_type = 'click'", "+"),
         ("c", "c.event_type = 'purchase'")],
        "ts_sec", float(n))
    t0 = time.time()
    assert match_pattern_pandas(pdf, pattern) == []
    elapsed = time.time() - t0
    assert elapsed < 20, f"quantified no-match blowup: {elapsed:.1f}s"


def test_quantified_spark_plans_agree(spark, qc):
    """Plain, bucketed and auto Spark plans must produce identical
    quantified matches — and equal the brute force — on a multi-key
    stream (same pin as test_cep_bucketed_equals_plain_and_brute_force
    but with a '*' and a '+' in the pattern)."""
    from quokka_spark.operators.cep import pattern_recognize
    rng = np.random.RandomState(7)
    frames = []
    for uid in range(6):
        n = 60
        frames.append(pd.DataFrame({
            "user_id": [uid] * n,
            "ts_sec": np.sort(rng.choice(
                np.arange(n * 4, dtype="float64"), n, replace=False)),
            "event_type": rng.choice(
                ["signup", "click", "purchase", "view"], size=n),
            "value": rng.randint(0, 8, size=n).astype("float64")}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    events = [("a", "a.event_type = 'signup'"),
              ("b", "b.event_type = 'click'", "*"),
              ("c", "c.event_type = 'purchase'", "+")]
    brute_events = [("a", _is("signup"), "1"),
                    ("b", _is("click"), "*"),
                    ("c", _is("purchase"), "+")]
    maxspan = 30.0

    def norm(out):
        p = out.toPandas()
        return sorted(zip(p["user_id"], p["event_number"],
                          p["first_event_timestamp"],
                          p["last_event_timestamp"]))

    plain = norm(pattern_recognize(df, "ts_sec", events, maxspan,
                                   "user_id", bucket=None))
    bucketed = norm(pattern_recognize(df, "ts_sec", events, maxspan,
                                      "user_id", bucket=45.0))
    auto = norm(pattern_recognize(df, "ts_sec", events, maxspan,
                                  "user_id", bucket="auto"))
    assert plain == bucketed == auto
    want = []
    for uid, grp in pdf.groupby("user_id"):
        found = brute_force_quant(grp, brute_events, maxspan)
        want += [(uid, k, f, l) for k, (f, l) in enumerate(found)]
    assert plain == sorted(want)
    assert len(plain) > 0, "fixture produced no matches — vacuous"


def test_quantified_streaming_matches_batch(spark, qc, tmp_path):
    """streaming_pattern_recognize runs the same kernel — a quantified
    pattern must produce the batch plan's matches (ignoring
    event_number, which streaming emits per arrival order)."""
    from quokka_spark.streaming.stream import streaming_pattern_recognize
    from quokka_spark.operators.cep import pattern_recognize
    rng = np.random.RandomState(11)
    n = 80
    pdf = pd.DataFrame({
        "user_id": rng.randint(0, 4, size=n).astype("int64"),
        "ts_sec": np.sort(rng.choice(
            np.arange(n * 4, dtype="float64"), n, replace=False)),
        "event_type": rng.choice(
            ["signup", "click", "purchase", "view"], size=n),
        "value": rng.randint(0, 8, size=n).astype("float64")})
    pdf["ts"] = pd.to_datetime(pdf["ts_sec"], unit="s")
    src = str(tmp_path / "src")
    batch_df = spark.createDataFrame(pdf)
    batch_df.coalesce(1).write.parquet(src)
    events = [("a", "a.event_type = 'signup'"),
              ("b", "b.event_type = 'click'", "*"),
              ("c", "c.event_type = 'purchase'")]
    batch = pattern_recognize(batch_df, "ts_sec", events, 25.0,
                              "user_id", bucket=None).toPandas()
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = streaming_pattern_recognize(stream, "ts_sec", events, 25.0,
                                      "user_id", wm_col="ts")
    q = (out.writeStream.format("memory").queryName("cep_quant_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from cep_quant_stream").toPandas()
    key = ["user_id", "first_event_timestamp", "last_event_timestamp"]
    assert (sorted(map(tuple, got[key].values.tolist()))
            == sorted(map(tuple, batch[key].values.tolist())))
    assert len(got) > 0


# ----------------------------------------------------------------------
# hypothesis: random patterns (random quantifier assignment + optional
# dependent last predicate) on random streams vs the brute force
# ----------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TYPES = ["signup", "click", "view", "purchase"]


@st.composite
def _pattern_and_stream(draw):
    n_events = draw(st.integers(2, 4))
    quants = [draw(st.sampled_from(["1", "+"]))]
    quants += [draw(st.sampled_from(["1", "+", "*", "?"]))
               for _ in range(n_events - 2)]
    if n_events > 1:
        quants.append(draw(st.sampled_from(["1", "+"])))
    ev_types = [draw(st.sampled_from(_TYPES)) for _ in range(n_events)]
    use_dep = draw(st.booleans())
    engine, brute = [], []
    for i, (t, q) in enumerate(zip(ev_types, quants)):
        nm = f"e{i}"
        pred = f"{nm}.event_type = '{t}'"

        def bfn(r, b, rows, tt=t):
            return r.event_type == tt

        if use_dep and i == n_events - 1:
            # the first event is always bindable ('1'/'+') so a dep on
            # it is structurally legal for any generated pattern
            pred += f" and {nm}.value > e0.value"

            def bfn(r, b, rows, tt=t):  # noqa: F811
                return (r.event_type == tt
                        and r.value > rows.iloc[b["e0"]].value)

        engine.append((nm, pred, q))
        brute.append((nm, bfn, q))
    n = draw(st.integers(3, 22))
    types_stream = [draw(st.sampled_from(_TYPES)) for _ in range(n)]
    values = [float(draw(st.integers(0, 5))) for _ in range(n)]
    maxspan = float(draw(st.sampled_from([4.0, 10.0, 100.0])))
    pdf = pd.DataFrame({
        "user_id": [1] * n,
        "ts_sec": np.arange(n, dtype="float64"),
        "event_type": types_stream,
        "value": values})
    return engine, brute, pdf, maxspan


@settings(deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_pattern_and_stream())
def test_random_quantified_patterns_match_brute_force(case):
    from quokka_spark.operators.cep import (CompiledPattern,
                                            match_pattern_pandas)
    engine, brute, pdf, maxspan = case
    pattern = CompiledPattern(
        ["user_id", "ts_sec", "event_type", "value"],
        engine, "ts_sec", maxspan)
    got = match_pattern_pandas(pdf, pattern)
    want = brute_force_quant(pdf, brute, maxspan)
    assert got == want, (engine, maxspan, pdf.to_string(), got, want)
