"""Property-based tests (hypothesis): invariants the example-based suite
can't sweep — random invertible pipelines round-trip, content ids are
canonical under key reordering, sessionize never creates/destroys rows.

The reference's suite is purely example-based (SURVEY.md §5); these
properties generalize its golden tests.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lens_spark import engine
from lens_spark.model import LensConfig

# --- strategies -----------------------------------------------------------

_COLS = ["Age", "Score"]

_invertible_module = st.one_of(
    st.builds(lambda c, m: {"name": "add", "arguments": {"column": c, "magnitude": m}},
              st.sampled_from(_COLS), st.integers(-100, 100)),
    st.builds(lambda c, m: {"name": "multiply",
                            "arguments": {"column": c, "factor": m}},
              st.sampled_from(_COLS), st.sampled_from([2, 4, 5, 10])),
    st.builds(lambda d: {"name": "rename", "arguments": {"src": "Name", "dst": d}},
              st.sampled_from(["FullName", "N2"])),
)


def _fix_renames(mods):
    """Make rename chains well-formed: each rename's src is the current
    name of the original 'Name' column."""
    cur = "Name"
    fixed = []
    for m in mods:
        if m["name"] == "rename":
            if m["arguments"]["dst"] == cur:
                continue
            m = {"name": "rename",
                 "arguments": {"src": cur, "dst": m["arguments"]["dst"]}}
            cur = m["arguments"]["dst"]
        fixed.append(m)
    return fixed


pipelines = st.lists(_invertible_module, min_size=1, max_size=4).map(_fix_renames) \
    .filter(lambda m: len(m) > 0).map(lambda m: {"lenses": m})


# --- properties -----------------------------------------------------------

@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=pipelines)
def test_forward_then_inverse_is_identity(spark, spec):
    df = spark.createDataFrame(
        [("John", 30, 10.0), ("Fred", -4, 2.5)],
        "Name string, Age long, Score double")
    out = engine.append(engine.append(df, spec), engine.invert(spec))
    assert out.columns == df.columns
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


@settings(max_examples=50, deadline=None)
@given(spec=pipelines)
def test_content_id_canonical_under_json_reordering(spec):
    config = LensConfig.from_dict(spec)
    # reserialize with shuffled key order / whitespace
    noisy = json.dumps(config.to_dict(), sort_keys=False, indent=3)
    assert LensConfig.from_json(noisy).content_id() == config.content_id()


@settings(max_examples=50, deadline=None)
@given(spec=pipelines)
def test_double_inversion_is_original(spec):
    config = LensConfig.from_dict(spec)
    assert config.inverted().inverted() == config


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(1, 5),
              st.integers(0, 10_000)),  # (user, seconds offset)
    min_size=1, max_size=40))
def test_sessionize_preserves_rows_and_orders_sessions(spark, rows):
    import datetime as dt
    from lens_spark.operators.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), i) for i, (u, s) in enumerate(rows)],
        "user long, ts timestamp, eid long")
    out = sessionize(df, key="user", ts_col="ts", gap="10 minutes",
                     tie_break=["eid"]).collect()
    assert len(out) == len(rows)  # 1:1, never drops/creates
    by_user = {}
    for r in sorted(out, key=lambda r: (r.user, r.ts, r.eid)):
        by_user.setdefault(r.user, []).append(r.session_idx)
    for sessions in by_user.values():
        assert sessions[0] == 1                      # 1-based
        for a, b in zip(sessions, sessions[1:]):
            assert b in (a, a + 1)                   # monotone, gapless


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(f1=st.floats(0.05, 0.45), f2=st.floats(0.5, 0.95))
def test_sample_fractions_are_nested(spark, f1, f2):
    """Hash-threshold sampling is monotone: the f1 sample is a strict
    subset of any larger-fraction sample over the same keys — the
    property that lets a pipeline grow its sample without resampling."""
    from lens_spark.operators.sampling import sample_hash

    df = spark.range(0, 400).withColumnRenamed("id", "k")
    small = {r.k for r in sample_hash(df, ["k"], f1).collect()}
    large = {r.k for r in sample_hash(df, ["k"], f2).collect()}
    assert small <= large


def test_sample_equals_first_split_mass(spark):
    """sample_hash(f) selects exactly the rows hash_split assigns to a
    first split of fraction f (same salt ⇒ same hash ranges)."""
    from lens_spark.operators.sampling import hash_split, sample_hash

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    sampled = {r.k for r in sample_hash(df, ["k"], 0.8).collect()}
    train = {r.k for r in
             hash_split(df, ["k"], {"train": 0.8, "rest": 0.2}).collect()
             if r.split == "train"}
    assert sampled == train


# --- corpus curation invariants -------------------------------------------

_line = st.sampled_from(["menu", "footer", "alpha beta", "gamma", "delta e",
                         "zeta", "eta theta", "iota", "kappa l", "mu nu"])
_doc_texts = st.lists(
    st.lists(_line, min_size=0, max_size=5).map("\n".join),
    min_size=1, max_size=8)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_doc_texts, st.integers(2, 3))
def test_line_dedup_is_idempotent_and_preserves_rows(spark, texts, min_df):
    """Once boilerplate (df >= min_df) is removed, every surviving line
    has df < min_df by construction — a second pass must be a no-op.
    Row count is always preserved (emptied docs stay as '')."""
    from lens_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = line_dedup(df, "doc_id", "text", min_df=min_df)
    twice = line_dedup(once, "doc_id", "text", min_df=min_df)
    a = {(r.doc_id, r.text) for r in once.collect()}
    b = {(r.doc_id, r.text) for r in twice.collect()}
    assert a == b
    assert len(a) == len(texts)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 40),
       st.floats(0.0, 3.0).map(lambda w: round(w, 2)))
def test_oversample_copy_count_matches_weight(spark, n, w):
    """Total output size is n*floor(w) + |fractional sample|, the
    fractional sample is a subset of the rows, and copy indexes are
    exactly 1..n_i per row."""
    from lens_spark.operators.sampling import oversample

    df = spark.createDataFrame([(i, "s") for i in range(n)],
                               "id long, src string")
    out = [(r.id, r.repeat_idx) for r in
           oversample(df, ["id"], "src", {"s": w}).collect()]
    per_id = {}
    for i, ri in out:
        per_id.setdefault(i, set()).add(ri)
    frac_rows = sum(1 for copies in per_id.values()
                    if len(copies) == int(w) + 1)
    for copies in per_id.values():
        assert copies == set(range(1, len(copies) + 1))
        assert len(copies) in (int(w), int(w) + 1)
    assert len(out) == n * int(w) + frac_rows
    if w == 0.0:
        assert not out


_span_texts = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                              "zeta", "eta", "theta"]),
             min_size=0, max_size=12).map(" ".join),
    min_size=2, max_size=8)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_span_texts, st.integers(3, 5))
def test_span_dedup_preserves_rows_and_never_invents_tokens(spark, texts, span):
    """Row count is preserved (emptied docs stay as ''), and the output
    tokens of each doc are a subsequence of its input tokens —
    span_dedup only ever deletes."""
    from lens_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           span_dedup(df, "doc_id", "text", span=span, min_df=2).collect()}
    assert len(out) == len(texts)
    for i, original in enumerate(texts):
        src = original.split()
        got = out[i].split() if out[i] else []
        it = iter(src)
        assert all(tok in it for tok in got), (src, got)  # subsequence


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 120), st.integers(1, 6), st.text("ab", max_size=3))
def test_shuffle_shards_is_a_bijection_onto_dense_positions(spark, n, shards, salt):
    """Every row keeps exactly one (shard, pos); positions per shard
    are dense 1..size; total mass is preserved."""
    from lens_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = [(r.id, r.shard, r.shard_pos) for r in
           shuffle_shards(df, ["id"], shards, salt=salt).collect()]
    assert len(got) == n and len({g[0] for g in got}) == n
    per_shard: dict = {}
    for _, s, p in got:
        per_shard.setdefault(s, []).append(p)
    assert set(per_shard) <= set(range(shards))
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 60), st.integers(1, 10))
def test_sample_exact_k_returns_min_k_n_rows(spark, n, k):
    """Output size is exactly min(k, n) and a subset of the input."""
    from lens_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame([(i, "s") for i in range(n)],
                               "id long, src string")
    got = [r.id for r in sample_exact_k(df, ["id"], "src", k).collect()]
    assert len(got) == min(k, n)
    assert set(got) <= set(range(n))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_span_texts, st.integers(1, 3))
def test_segment_filter_preserves_rows_and_only_deletes_segments(
        spark, texts, min_tokens):
    """Row count preserved; each output doc's segments are a
    subsequence of its input segments (segment_filter only deletes,
    never rewrites); idempotent (intrinsic rules are per-segment)."""
    from lens_spark.operators.text import segment_filter

    docs = [(i, "\n".join(texts[i:i + 3])) for i in range(len(texts))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = segment_filter(df, "doc_id", "text", min_tokens=min_tokens)
    out = {r.doc_id: r.text for r in once.collect()}
    assert len(out) == len(docs)
    for i, original in docs:
        src = original.split("\n")
        got = out[i].split("\n") if out[i] else []
        it = iter(src)
        assert all(seg in it for seg in got), (src, got)
    twice = segment_filter(once, "doc_id", "text", min_tokens=min_tokens)
    assert {(r.doc_id, r.text) for r in twice.collect()} \
        == {(r.doc_id, r.text) for r in once.collect()}


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=600),
                        max_size=40), min_size=1, max_size=6))
def test_normalize_text_idempotent(spark, texts):
    """Canonicalization is a projection onto its own fixed points:
    applying it twice equals applying it once."""
    from lens_spark.operators.text import normalize_text

    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, text string")
    once = {r.id: r.text for r in
            normalize_text(df, "text").collect()}
    twice = {r.id: r.text for r in
             normalize_text(normalize_text(df, "text"), "text").collect()}
    assert once == twice


@given(st.lists(st.text(alphabet="ab cd", min_size=0, max_size=30),
                min_size=1, max_size=6),
       st.integers(1, 7), st.integers(0, 6))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_documents_covers_tokens_exactly(spark, texts, size, overlap):
    """For any corpus and any valid (size, overlap): concatenating each
    doc's chunk token-lists with the overlap removed reproduces the
    doc's token sequence exactly — no token lost, duplicated (beyond
    the declared overlap), or reordered. Token-less docs emit nothing."""
    from lens_spark.operators.text import chunk_documents

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = chunk_documents(df, "text", size=size, overlap=overlap).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_index)):
        toks = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(toks) == r.chunk_tokens
        assert 1 <= r.chunk_tokens <= size
        prev = got.setdefault(r.doc_id, [])
        prev.extend(toks if r.chunk_index == 0 else toks[overlap:])
    for i, t in enumerate(texts):
        expect = [w for w in t.split() if w]
        if expect:
            assert got[i] == expect, (i, t, size, overlap)
        else:
            assert i not in got


# --- round-6 operator properties ------------------------------------------

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=2, max_size=6))
def test_containment_matches_brute_force(spark, texts):
    """containment_pairs equals the brute-force set computation on
    random tiny corpora: c_a = |A∩B|/|A| over distinct word 2-grams,
    pairs emitted iff max(c_a, c_b) ≥ threshold."""
    from lens_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, text string")
    got = {(r.id_a, r.id_b): (r.containment_a, r.containment_b)
           for r in containment_pairs(df, "id", "text", ngram=2,
                                      threshold=0.4).collect()}

    def grams(t):
        w = [x for x in t.lower().split() if x]
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}

    expect = {}
    gs = [grams(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(gs[a] & gs[b])
            if not inter or not gs[a] or not gs[b]:
                continue
            ca, cb = round(inter / len(gs[a]), 6), round(inter / len(gs[b]), 6)
            if max(ca, cb) >= 0.4:
                expect[(a, b)] = (ca, cb)
    assert got == expect


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scores=st.lists(st.floats(-100, 100, allow_nan=False),
                       min_size=1, max_size=20))
def test_score_band_sizes_and_monotonicity(spark, scores):
    """Bands partition each stratum into contiguous runs of the score
    order: band counts differ by ≤ 1 from the even split ±1 (ties
    share percent_rank), and a higher score never lands in a LARGER
    band than a lower one."""
    from lens_spark.operators.text import score_band

    df = spark.createDataFrame(
        [(i, "s", float(v)) for i, v in enumerate(scores)],
        "id long, src string, sc double")
    rows = score_band(df, "sc", "id", strata="src", bands=3).collect()
    by_rank = sorted(rows, key=lambda r: (-r.sc, r.id))
    bands = [r.band for r in by_rank]
    assert bands == sorted(bands)              # monotone along the order
    assert all(0 <= b <= 2 for b in bands)
    assert bands[0] == 0                        # top row is head band


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vec=st.lists(st.floats(-10, 10, allow_nan=False,
                              allow_infinity=False)
                    .map(lambda x: 0.0 if abs(x) < 1e-6 else x),
                    min_size=4, max_size=8))
def test_matryoshka_unit_norm_or_zero(spark, vec):
    """The truncated-renormalized prefix has unit L2 norm unless the
    prefix is all-zero (then it stays the zero vector). Components are
    constrained away from denormals: squaring a ~1e-308 input
    underflows to norm 0, which the operator (correctly) treats as a
    zero prefix."""
    import math

    from pyspark.sql import functions as F

    from lens_spark.functions.vectors import l2_norm, matryoshka_truncate

    df = spark.createDataFrame([(1, [float(x) for x in vec])],
                               "id long, v array<double>")
    r = df.select(
        matryoshka_truncate(F.col("v"), 3).alias("t"),
        l2_norm(matryoshka_truncate(F.col("v"), 3)).alias("n")).collect()[0]
    if any(x != 0.0 for x in vec[:3]):
        assert math.isclose(r.n, 1.0, rel_tol=1e-9)
    else:
        assert r.t == [0.0, 0.0, 0.0]


# --- rolling_agg ≡ brute-force reference -----------------------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(1, 3),        # key
                          st.integers(0, 7200),     # second offset
                          st.integers(-5, 5)),      # value
                min_size=1, max_size=40))
def test_rolling_agg_matches_bruteforce(spark, rows):
    """For every row, the RANGE frame must equal the set
    {same key, t' in [t − W, t]} computed naively in Python —
    including ties (frame peers) and empty-history rows."""
    import datetime as dt

    from lens_spark.operators.temporal import rolling_agg

    W = 3600
    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(seconds=s), float(v))
            for k, s, v in rows]
    df = spark.createDataFrame(data, "k long, ts timestamp, v double")
    got = {(r.k, r.ts, r.v, r.n, r.s)
           for r in rolling_agg(df, key="k", ts_col="ts",
                                window="1 hour",
                                aggs={"n": "count(*)",
                                      "s": "sum(v)"}).collect()}
    expect = set()
    for k, t, v in data:
        peers = [v2 for k2, t2, v2 in data
                 if k2 == k and t - dt.timedelta(seconds=W) <= t2 <= t]
        expect.add((k, t, v, len(peers), sum(peers)))
    assert got == expect


# --- binary_eval AUC ≡ local rank reference ---------------------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.floats(0, 1, width=16, allow_nan=False),
                          st.integers(0, 1)),
                min_size=2, max_size=60))
def test_binary_eval_auc_matches_rank_reference(spark, rows):
    """AUC from the distributed rank statistic equals the local
    average-rank Mann-Whitney computation (ties included)."""
    from lens_spark.operators.evaluation import binary_eval

    df = spark.createDataFrame([(float(s), y) for s, y in rows],
                               "s double, y int")
    got = binary_eval(df, score="s", label="y").collect()[0].auc
    scores = sorted(round(float(s), 6) for s, _ in rows)
    pos = [round(float(s), 6) for s, y in rows if y == 1]
    n_pos, n_neg = len(pos), len(rows) - len(pos)
    if n_pos == 0 or n_neg == 0:
        assert got is None
        return
    import bisect
    ranksum = 0.0
    for s in pos:
        lo = bisect.bisect_left(scores, s)
        hi = bisect.bisect_right(scores, s)
        ranksum += (lo + 1 + hi) / 2          # average rank of tie group
    expect = round((ranksum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg), 6)
    assert got == expect


# --- digest recipes (functions/digest.py, r7) -----------------------------
#
# The SQL templates are exact integer arithmetic; pin them against a
# decimal.Decimal half-away reference via DuckDB (which shares the //
# semantics the oracles use). No Spark needed.

@given(s=st.integers(min_value=-10**17, max_value=10**17),
       n=st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_round6_mean_sql_matches_decimal_reference(s, n):
    import decimal

    import duckdb

    from lens_spark.functions.digest import OUT_SCALE, TERM_SCALE, round6_mean_sql

    expr = round6_mean_sql("s", "n")
    got = duckdb.sql(
        f"SELECT {expr} AS v FROM (SELECT CAST({s} AS BIGINT) AS s, "
        f"CAST({n} AS BIGINT) AS n)").fetchone()[0]
    # reference: round-half-away of s/(n * TERM_SCALE/OUT_SCALE) at 6dp
    d = decimal.Decimal(s) / (decimal.Decimal(n)
                              * (TERM_SCALE // OUT_SCALE))
    micro = d.quantize(decimal.Decimal(1),
                       rounding=decimal.ROUND_HALF_UP)
    assert got == float(micro) / OUT_SCALE


@given(s=st.integers(min_value=-10**17, max_value=10**17))
@settings(max_examples=300, deadline=None)
def test_round6_scaled_sum_sql_matches_decimal_reference(s):
    import decimal

    import duckdb

    from lens_spark.functions.digest import (
        OUT_SCALE,
        TERM_SCALE,
        round6_scaled_sum_sql,
    )

    expr = round6_scaled_sum_sql("s")
    got = duckdb.sql(
        f"SELECT {expr} AS v FROM (SELECT CAST({s} AS BIGINT) AS s)"
    ).fetchone()[0]
    d = decimal.Decimal(s) / (TERM_SCALE // OUT_SCALE)
    micro = d.quantize(decimal.Decimal(1),
                       rounding=decimal.ROUND_HALF_UP)
    assert got == float(micro) / OUT_SCALE


def test_round6_expr_and_sql_twins_agree_on_spark(spark):
    """The Spark `div` template and the DuckDB `//` template must
    produce identical doubles for the same (s, n) — including negative
    sums and exact-half boundaries."""
    import duckdb

    from lens_spark.functions.digest import round6_mean_expr, round6_mean_sql

    cases = [(0, 1), (1, 1), (-1, 1), (50_000, 1), (-50_000, 1),
             (150_000, 1), (-150_000, 1), (10**15 + 50_000, 7),
             (-(10**15) - 50_000, 7), (123_456_789_012, 997)]
    df = spark.createDataFrame(cases, "s long, n long")
    got = {(r.s, r.n): r.v for r in df.selectExpr(
        "s", "n", f"{round6_mean_expr('s', 'n')} AS v").collect()}
    for s, n in cases:
        ref = duckdb.sql(
            f"SELECT {round6_mean_sql('s', 'n')} AS v FROM "
            f"(SELECT CAST({s} AS BIGINT) AS s, CAST({n} AS BIGINT) AS n)"
        ).fetchone()[0]
        assert got[(s, n)] == ref, (s, n)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(va=st.lists(st.integers(0, 25), min_size=1, max_size=40),
       vb=st.lists(st.integers(0, 25), min_size=1, max_size=40))
def test_ks_drift_equals_bruteforce_ecdf(spark, va, vb):
    """KS numerator == brute-force max over every observed value, and
    the statistic is symmetric: D(a,b) == D(b,a)."""
    from lens_spark.operators.evaluation import ks_drift

    dfa = spark.createDataFrame([(i, v) for i, v in enumerate(va)],
                                "id long, v long")
    dfb = spark.createDataFrame([(i, v) for i, v in enumerate(vb)],
                                "id long, v long")
    r = ks_drift(dfa, dfb, "v").collect()[0]
    na, nb = len(va), len(vb)
    d_num = max(abs(sum(1 for x in va if x <= t) * nb
                    - sum(1 for x in vb if x <= t) * na)
                for t in set(va) | set(vb))
    assert (r.n_a, r.n_b, r.d_num) == (na, nb, d_num)
    rev = ks_drift(dfb, dfa, "v").collect()[0]
    assert rev.d_num == r.d_num and rev.d_microunits == r.d_microunits


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.dictionaries(st.sampled_from(["a", "b", "c", "d"]),
                             st.integers(1, 12), min_size=2, max_size=4),
       weights=st.dictionaries(st.sampled_from(["a", "b", "c", "d"]),
                               st.integers(0, 5), max_size=4),
       budget=st.integers(10, 5000))
def test_epoch_plan_invariants(spark, sizes, weights, budget):
    """served ≤ target (floor + cap only shrink), epochs ≤ cap,
    zero-weight strata get zero target, and Σ target ≤ budget."""
    from lens_spark.operators.sampling import epoch_plan

    rows = [(f"{s}{i}", s, "t " * 5) for s, n in sizes.items()
            for i in range(n)]
    df = spark.createDataFrame(rows, "id string, source string, text string")
    wsum = sum(weights.get(s, 1) for s in sizes)
    if wsum == 0:
        return
    out = epoch_plan(df, "source", total_budget_tokens=budget,
                     weights=weights, text_col="text").collect()
    assert sum(r.target_tokens for r in out) <= budget
    for r in out:
        assert r.served_tokens <= r.target_tokens
        assert 0 <= r.epochs_milli <= 4000
        if weights.get(r.source, 1) == 0:
            assert r.target_tokens == 0 and r.served_tokens == 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(1, 60),
       w0=st.integers(1, 4), w1=st.integers(1, 4),
       shards=st.sampled_from([1, 2, 4]))
def test_interleave_pos_is_dense_and_ratio_bounded(spark, n, w0, w1, shards):
    """Within every shard: pos values are unique; within every FULL
    block each stratum appears exactly its weight times; and ranks
    within a stratum are contiguous from 0."""
    from collections import Counter, defaultdict

    from lens_spark.operators.sampling import interleave

    rows = [(i, "s0" if i % 2 == 0 else "s1") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = interleave(df, "src", ["id"], {"s0": w0, "s1": w1},
                     num_shards=shards).collect()
    assert len(out) == n
    W = w0 + w1
    per_shard = defaultdict(list)
    for r in out:
        per_shard[r.shard].append(r)
    for rs in per_shard.values():
        assert len({r.pos for r in rs}) == len(rs)
        blocks = Counter(r.block for r in rs)
        for b, c in blocks.items():
            if c == W:  # full block serves the exact mixture
                served = Counter(r.src for r in rs if r.block == b)
                assert served == Counter({"s0": w0, "s1": w1})


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    st.tuples(st.text(alphabet="ab", min_size=1, max_size=4),
              st.integers(1, 50)),
    min_size=1, max_size=8))
def test_bpe_batched_distributed_equals_sequential(spark, words):
    """The batched distributed merge loop must be byte-identical to
    one-recount-per-merge sequential BPE on ARBITRARY corpora — tiny
    alphabets maximize pair interactions (created-pair outranking,
    destroyed adjacencies, merged-symbol collisions), so this hammers
    every batch guard in `_select_batch`."""
    from lens_spark.operators.bpe import _fit_local, bpe_fit

    wc: dict[str, int] = {}
    for w, c in words:
        wc[w] = wc.get(w, 0) + c
    corpus = " ".join(w for w, c in wc.items() for _ in range(c))
    df = spark.createDataFrame([(corpus,)], "text string")
    seq = _fit_local(wc, 6, 1)  # sequential reference (itself pinned
    #                             against the pure-python test twin)
    dist = bpe_fit(df, "text", num_merges=6, min_count=1,
                   min_word_count=1, driver_fit_limit=0, batch_cap=4)
    assert dist == seq


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rankings=st.lists(
    st.tuples(st.integers(0, 2),        # query
              st.integers(0, 30),       # candidate
              st.integers(1, 20)),      # rank
    min_size=1, max_size=60),
    parts=st.sampled_from([1, 3, 7]),
    seed=st.integers(0, 2**31 - 1))
def test_rrf_fuse_is_order_and_partitioning_invariant(spark, rankings,
                                                      parts, seed):
    """The fused scores and ranks must not depend on union row order,
    system order, or physical partitioning — the quantized scaled-long
    sum's whole claim. Hypothesis feeds random tagged-union shapes
    (duplicate (query, candidate) rows across systems included — they
    are exactly what the sum wants) and a random shuffle/partition
    count; the fused table must be byte-identical."""
    import random

    from lens_spark.operators.ranking import rrf_fuse

    base = spark.createDataFrame(rankings,
                                 "query_id long, doc long, rank long")
    got = {tuple(r) for r in rrf_fuse(base, "query_id", "doc",
                                      k0=60, k=10).collect()}
    shuffled = list(rankings)
    random.Random(seed).shuffle(shuffled)
    alt = (spark.createDataFrame(shuffled,
                                 "query_id long, doc long, rank long")
           .repartition(parts))
    got2 = {tuple(r) for r in rrf_fuse(alt, "query_id", "doc",
                                       k0=60, k=10).collect()}
    assert got == got2
