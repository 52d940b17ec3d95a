"""Corpus-curation lens tests: repetition/quality filtering, PII
redaction, benchmark decontamination, stratified sampling, int8
embedding quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.dedup import decontaminate
from lens_spark.operators.sampling import sample_stratified
from lens_spark.operators.text import pii_redact, quality_filter, repetition_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# --- repetition stats / quality filter --------------------------------------

def test_repetition_metrics_on_crafted_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),                    # maximal repetition
            (2, "one two three four"),         # fully diverse
            (3, ""),                           # empty doc
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in repetition_stats(df, "text").collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].unique_ratio == pytest.approx(0.25)
    assert rows[1].top_token_frac == pytest.approx(1.0)
    assert rows[1].top_bigram_frac == pytest.approx(1.0)
    assert rows[2].unique_ratio == pytest.approx(1.0)
    assert rows[2].top_token_frac == pytest.approx(0.25)
    assert rows[2].mean_word_len == pytest.approx((3 + 3 + 5 + 4) / 4)
    assert rows[3].n_tokens == 0 and rows[3].unique_ratio == 0.0


def test_quality_filter_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),       # repetitive
            (2, "a genuinely varied simple sentence"),  # clean
            (3, "hi"),                                  # too short
        ],
        "id long, text string",
    )
    kept = quality_filter(df, "text", {
        "min_tokens": 3, "max_top_token_frac": 0.5})
    assert [r.id for r in kept.collect()] == [2]
    # metric scratch columns must not leak
    assert kept.columns == ["id", "text"]


def test_quality_filter_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(LensError):
        quality_filter(df, "text", {"min_sparkle": 1.0})


# --- PII redaction -----------------------------------------------------------

def test_pii_redact_all_categories(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x.io call 555-867-5309 ssn 123-45-6789 ip 10.1.2.3")],
        "id long, text string",
    )
    row = pii_redact(df, "text", counts=True).collect()[0]
    assert row.text == "mail [EMAIL] call [PHONE] ssn [ID] ip [IP]"
    assert (row.n_email, row.n_ssn, row.n_phone, row.n_ipv4) == (1, 1, 1, 1)


def test_pii_redact_r9_categories_and_ordering(spark):
    """r9 categories: card (4-4-4-4), international phone (+cc-...),
    full-form IPv6 — and the pattern ORDER contract: the specific
    shape consumes its whole span, so '+44-…' never degrades to a
    dangling '+44-[PHONE]' and a card never half-redacts as a
    phone/ssn fragment."""
    df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 call +44-20-7946-0958 "
             "via fe80:0000:0000:0000:0202:b3ff:fe1e:8329")],
        "id long, text string",
    )
    row = pii_redact(df, "text", counts=True).collect()[0]
    assert row.text == "pay [CARD] call [PHONE] via [IP]"
    assert (row.n_card, row.n_intl_phone, row.n_ipv6) == (1, 1, 1)
    # the generic patterns must NOT also fire on these spans
    assert (row.n_phone, row.n_ssn, row.n_ipv4) == (0, 0, 0)


def test_pii_redact_clean_text_untouched(spark):
    df = spark.createDataFrame([(1, "nothing sensitive here")],
                               "id long, text string")
    row = pii_redact(df, "text", counts=True).collect()[0]
    assert row.text == "nothing sensitive here"
    assert row.n_email == row.n_ssn == row.n_phone == row.n_ipv4 == 0
    assert row.n_card == row.n_intl_phone == row.n_ipv6 == 0


def test_pii_redact_out_column(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "id long, text string")
    row = pii_redact(df, "text", out="clean").collect()[0]
    assert row.text == "x@y.io" and row.clean == "[EMAIL]"


# --- benchmark decontamination -----------------------------------------------

def test_decontaminate_drops_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated training document here"),
        ],
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox appears in this benchmark")],
        "id long, text string",
    )
    out = decontaminate(train, bench, "id", "text", ngram=3)
    assert [r.id for r in out.collect()] == [2]


def test_decontaminate_min_overlaps(spark):
    # exactly one shared 3-gram → kept when min_overlaps=2
    train = spark.createDataFrame(
        [(1, "alpha beta gamma totally different tail")],
        "id long, text string")
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma other words")], "id long, text string")
    assert decontaminate(train, bench, "id", "text", ngram=3,
                         min_overlaps=2).count() == 1
    assert decontaminate(train, bench, "id", "text", ngram=3,
                         min_overlaps=1).count() == 0


# --- stratified sampling ------------------------------------------------------

def test_stratified_fractions_respected(docs):
    out = sample_stratified(docs, ["doc_id"], "source",
                            {"src0": 0.0, "src1": 1.0},
                            default_fraction=0.5)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.source: r.n for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "src0" not in counts
    assert counts["src1"] == full["src1"]
    others = sum(v for k, v in counts.items() if k not in ("src0", "src1"))
    total = sum(v for k, v in full.items() if k not in ("src0", "src1"))
    assert 0.25 * total < others < 0.75 * total


def test_stratified_stable_under_repartition(docs):
    frac = {"src0": 0.3, "src1": 0.7}
    a = {r.doc_id for r in
         sample_stratified(docs, ["doc_id"], "source", frac).collect()}
    b = {r.doc_id for r in
         sample_stratified(docs.repartition(13), ["doc_id"], "source",
                           frac).collect()}
    assert a == b and a  # non-empty and identical membership


def test_stratified_subset_of_source(docs):
    out = sample_stratified(docs, ["doc_id"], "source", {"src0": 0.4})
    all_ids = {r.doc_id for r in docs.collect()}
    assert {r.doc_id for r in out.collect()} <= all_ids


# --- int8 quantization ---------------------------------------------------------

def test_quantize_roundtrip_error_bounded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    spec = {"lenses": [{"name": "quantize_embedding",
                        "arguments": {"column": "embedding"}}]}
    q = engine.append(emb, spec)
    assert dict(q.dtypes)["embedding"] == "array<tinyint>"
    # inverse (dequantize) restores within scale/2 per component
    back = engine.inverse(q, spec)
    joined = (back.alias("b").join(emb.alias("o"), "vec_id")
              .select(F.array_max(F.zip_with(
                  F.col("b.embedding"), F.col("o.embedding"),
                  lambda x, y: F.abs(x - y.cast("double")))).alias("err"),
                  F.array_max(F.transform(
                      F.col("o.embedding"),
                      lambda x: F.abs(x.cast("double")))).alias("ma")))
    bad = joined.filter(F.col("err") > F.col("ma") / 127.0 / 2 + 1e-12)
    assert bad.count() == 0
    assert back.columns == emb.columns  # scale sidecar dropped on invert


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])],
                               "id long, embedding array<float>")
    spec = {"lenses": [{"name": "quantize_embedding",
                        "arguments": {"column": "embedding"}}]}
    row = engine.append(df, spec).collect()[0]
    assert row.embedding == [0, 0, 0] and row.embedding_scale == 0.0


def test_contamination_score_fraction_and_row_preservation(spark):
    """Score = shared distinct grams / doc distinct grams; clean docs
    score 0.0; short docs keep their row at 0.0; full copies score 1.0."""
    from lens_spark.operators.dedup import contamination_score

    bench = spark.createDataFrame([(100, "a b c d e")],
                                  "doc_id long, text string")
    df = spark.createDataFrame(
        [(1, "a b c d e"),            # identical: all 3 grams shared
         (2, "a b c x y z"),          # shares 1 of 4 distinct 3-grams
         (3, "p q r s t"),            # disjoint
         (4, "hi")],                  # < ngram tokens
        "doc_id long, text string")
    out = {r.doc_id: r.contamination for r in
           contamination_score(df, bench, "doc_id", "text",
                               ngram=3).collect()}
    assert out == {1: 1.0, 2: 0.25, 3: 0.0, 4: 0.0}
    # threshold-at-1 equivalence with decontaminate: score>0 == dropped
    from lens_spark.operators.dedup import decontaminate

    kept = {r.doc_id for r in
            decontaminate(df, bench, "doc_id", "text", ngram=3,
                          min_overlaps=1).collect()}
    assert kept == {d for d, c in out.items() if c == 0.0}


def test_url_normalize_rules_and_collapse(spark):
    """scheme/www/case/query/fragment/trailing-slash variants collapse
    onto one canonical form; domain extraction matches."""
    from lens_spark import engine

    df = spark.createDataFrame(
        [(1, "https://www.Example.com/A/B?utm_source=x"),
         (2, "http://example.com/a/b#frag"),
         (3, "HTTPS://EXAMPLE.COM/a/b/"),
         (4, "http://other.org/path")],
        "id long, url string")
    out = engine.append(df, {"lenses": [{"name": "url_normalize",
                                         "arguments": {"column": "url",
                                                       "domain_out": "dom"}}]})
    rows = {r.id: (r.url, r.dom) for r in out.collect()}
    assert rows[1] == rows[2] == rows[3] == ("example.com/a/b", "example.com")
    assert rows[4] == ("other.org/path", "other.org")


def test_neardup_against_catches_paraphrase_exact_ngram_misses(spark):
    """A lightly-edited copy of a benchmark doc slips under exact
    8-gram decontamination tuned against false positives
    (min_overlaps=5: the edit leaves only 4 verbatim 8-grams) but
    clears the MinHash similarity bar; clean docs survive both.
    mode='drop' removes exactly the fuzzy hits."""
    from lens_spark.operators.dedup import decontaminate, neardup_against

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    toks = base.split()
    edited = toks[:]
    edited[8], edited[9] = edited[9], edited[8]  # one mid-doc swap
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    df = spark.createDataFrame(
        [(1, " ".join(edited)),
         (2, "totally unrelated words about something else entirely "
             "with no shared vocabulary at all in this document")],
        "doc_id long, text string")
    # the swap at 1-based positions 9-10 breaks every 8-gram window
    # except starts {1, 11, 12, 13}: exactly 4 verbatim overlaps, so a
    # min_overlaps=5 exact rule keeps BOTH docs
    exact = {r.doc_id for r in
             decontaminate(df, bench, "doc_id", "text", ngram=8,
                           min_overlaps=5).collect()}
    assert exact == {1, 2}
    # fuzzy near-dup drops the paraphrase, keeps the clean doc
    fuzzy = {r.doc_id for r in
             neardup_against(df, bench, "doc_id", "text", ngram=3,
                             threshold=0.5, mode="drop").collect()}
    assert fuzzy == {2}
    pairs = neardup_against(df, bench, "doc_id", "text", ngram=3,
                            threshold=0.5, mode="pairs").collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 100)}
    assert all(0.5 <= r.est_jaccard <= 1.0 for r in pairs)


def test_segment_filter_rules_and_reassembly(spark):
    """Token-window, alpha-ratio, and terminal-punctuation rules each
    drop their target segments; survivors keep original order; a doc
    with no surviving segment stays as ''."""
    from lens_spark.operators.text import segment_filter

    df = spark.createDataFrame(
        [(1, "A good first sentence.\n12 34 56\nok\nAnother good one!"),
         (2, "#### ---- ####")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           segment_filter(df, "doc_id", "text", min_tokens=2,
                          min_alpha_ratio=0.5).collect()}
    assert out[1] == "A good first sentence.\nAnother good one!"
    assert out[2] == ""
    # C4 terminal punctuation: 'no punct here' dropped
    df2 = spark.createDataFrame(
        [(1, "Keeps this one.\nno punct here\nAnd this?")],
        "doc_id long, text string")
    got = segment_filter(df2, "doc_id", "text", end_punct=True) \
        .collect()[0].text
    assert got == "Keeps this one.\nAnd this?"
    # max_tokens window
    df3 = spark.createDataFrame(
        [(1, "one two\none two three four five six")],
        "doc_id long, text string")
    got3 = segment_filter(df3, "doc_id", "text", max_tokens=3) \
        .collect()[0].text
    assert got3 == "one two"


def test_normalize_text_unicode_and_whitespace(spark):
    """NFC composition, control stripping, Unicode-space collapsing,
    optional lowercasing; newlines collapse too (they are \\s); unknown
    form raises."""
    from lens_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Cafe" + chr(0x301) + chr(0xA0) + " X" + chr(7) + "\n y ")],
        "id long, text string")
    got = normalize_text(df, "text").collect()[0].text
    assert got == "Café X y"
    low = normalize_text(df, "text", lowercase=True).collect()[0].text
    assert low == "café x y"
    keep_ws = normalize_text(df, "text",
                             collapse_whitespace=False).collect()[0].text
    assert "\n" in keep_ws
    with pytest.raises(LensError, match="unknown form"):
        normalize_text(df, "text", form="NFX")
