"""Fitted-model path tests beyond the registry round-trips in
test_registry.py: the lang_classifier artifact (one-vs-rest fit →
single-artifact save → one-pass multi-language scoring by model_id,
r9 verdict #5) and its accuracy against the marker heuristic on the
fixture corpus."""

from __future__ import annotations

import pytest

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.registry import Registry


@pytest.fixture()
def registry(tmp_path):
    return Registry(tmp_path / "reg")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))


def _labeled_corpus(spark, n_per_lang: int = 60):
    """Deterministic labeled multi-language corpus. The driver fixture
    (documents.parquet) draws its text from ONE shared synthetic
    vocabulary regardless of the `lang` label — the label carries no
    textual signal there (both the marker heuristic and any classifier
    sit at majority-class accuracy on it), so the lang-id comparison
    needs a corpus where language and text are actually correlated.
    Each language gets its marker words (the heuristic's signal) PLUS
    non-marker function words (signal only a fitted model can use);
    40% of docs contain NO marker words at all — the stratum where the
    heuristic must fail and the fitted model must not."""
    from lens_spark.functions.text import LANG_MARKERS

    extra = {
        "en": ("that", "with", "have", "this", "from", "they"),
        "de": ("ein", "mit", "auf", "sich", "auch", "wird"),
        "fr": ("dans", "pour", "avec", "sont", "plus", "mais"),
        "es": ("con", "por", "para", "como", "pero", "sobre"),
        "zh": ("他", "们", "这", "有", "个", "上"),
    }
    shared = ("data", "table", "row", "spark", "query", "batch")
    rows = []
    doc_id = 0
    for lang in sorted(extra):
        markers = LANG_MARKERS[lang]
        for i in range(n_per_lang):
            words = []
            for j in range(12):
                k = (i * 7 + j * 3) % 6
                if j % 3 == 0:
                    words.append(shared[k])
                elif i % 5 < 2:        # 40%: extra-words-only stratum
                    words.append(extra[lang][k])
                elif j % 3 == 1:
                    words.append(markers[k])
                else:
                    words.append(extra[lang][k])
            rows.append((doc_id, " ".join(words), lang))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_fitted_lang_id_beats_marker_heuristic(spark, registry):
    """The r9 verdict's quality ask: fit the existing classifier
    one-vs-rest per language on a labeled corpus, save as a single
    lang_classifier artifact, score by model_id through the lang_id
    lens, and compare against the marker heuristic. The fitted model
    must (a) be strongly accurate and (b) beat the heuristic — it
    learns the non-marker function words the heuristic is blind to."""
    from lens_spark.models import save_lang_id
    from pyspark.sql import functions as F

    corpus = _labeled_corpus(spark)
    mid = save_lang_id(registry, corpus, "lang", "text",
                       num_buckets=512, iters=15, lr=2.0)
    assert mid.startswith("lens1b-")
    spec = {"lenses": [{"name": "lang_id", "arguments": {
        "id": "doc_id", "column": "text", "model_id": mid,
        "registry": str(registry.root), "score": "lang_score"}}]}
    fitted = engine.append(corpus, spec)
    n = corpus.count()
    fit_acc = fitted.filter(F.col("pred_lang") == F.col("lang")).count() / n
    marker = engine.append(corpus, {"lenses": [{
        "name": "lang_id", "arguments": {"column": "text"}}]})
    marker_acc = marker.filter(
        F.col("pred_lang") == F.col("lang")).count() / n
    assert marker_acc <= 0.75, marker_acc  # the heuristic's blind spot
    assert fit_acc >= 0.95, (fit_acc, marker_acc)
    assert fit_acc > marker_acc, (fit_acc, marker_acc)
    # confidence column present and bounded
    row = fitted.select(F.min("lang_score"), F.max("lang_score")).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0
    # inverse drops both appended columns
    back = engine.inverse(fitted, spec)
    assert back.columns == corpus.columns


def test_lang_id_model_envelope_validation(spark, registry, docs):
    """Kind pinning + envelope integrity for the lang_classifier kind:
    a classifier artifact where a lang model is expected errors loudly;
    weights/num_buckets mismatches are refused before any job."""
    from lens_spark.models import save_lang_id, save_model
    from lens_spark.operators.text import lang_id_score

    wid = save_model(registry, "linear_classifier",
                     {"weights": [0.1, 0.2], "bias": 0.0})
    spec = {"lenses": [{"name": "lang_id", "arguments": {
        "id": "doc_id", "column": "text", "model_id": wid,
        "registry": str(registry.root)}}]}
    with pytest.raises(LensError, match="needs 'lang_classifier'"):
        engine.append(docs, spec)
    bad = {"langs": ["en", "de"], "num_buckets": 4,
           "models": {"en": {"weights": [0.0] * 4, "bias": 0.0},
                      "de": {"weights": [0.0] * 3, "bias": 0.0}}}
    with pytest.raises(LensError, match="num_buckets"):
        lang_id_score(docs, "doc_id", "text", bad)
    with pytest.raises(LensError, match="no languages"):
        lang_id_score(docs, "doc_id", "text",
                      {"langs": [], "num_buckets": 4, "models": {}})
    # too many languages refused at fit time (broadcast-width bound)
    with pytest.raises(LensError, match="64"):
        save_lang_id(registry, docs, "lang", "text",
                     langs=[f"l{i}" for i in range(65)])


def test_lang_id_score_one_pass_tie_break_and_empty_docs(spark):
    """Deterministic contract pins: alphabetical tie-break (the marker
    heuristic's rule) and token-less docs argmaxing the biases alone
    while keeping their row."""
    from lens_spark.operators.text import lang_id_score

    # zero weights everywhere -> all logits equal the bias
    model = {"langs": ["fr", "de", "en"], "num_buckets": 4,
             "models": {
                 "en": {"weights": [0.0] * 4, "bias": 0.5},
                 "de": {"weights": [0.0] * 4, "bias": 0.5},
                 "fr": {"weights": [0.0] * 4, "bias": -1.0}}}
    df = spark.createDataFrame([(1, "hello world"), (2, "")],
                               "doc_id long, text string")
    got = {r.doc_id: r.pred_lang
           for r in lang_id_score(df, "doc_id", "text", model).collect()}
    # en and de tie at 0.5 -> alphabetical first (de) for BOTH the
    # tokenized doc (zero weights) and the empty doc (bias argmax)
    assert got == {1: "de", 2: "de"}


def test_save_bloom_apply_by_id_no_false_negatives(spark, registry,
                                                   tmp_path):
    """bloom_bitset artifacts (r10): the saved filter applied by
    model_id drops EVERY doc the exact benchmark-scan path drops (the
    bloom has no false negatives by construction) without touching the
    benchmark at serving time; over-drop is bounded by the fp contract
    (tiny here); ngram/shingle come from the model; kind mismatch and
    corrupt bitsets are loud."""
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.models import load_model, save_bloom, save_vocab
    from lens_spark.operators.dedup import (
        bloom_decontaminate_saved,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "zeta eta theta iota kappa"),
         (3, "completely unrelated text with many different words"),
         (4, "alpha beta gamma delta NOT the same tail here")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"),
         (101, "zeta eta theta iota kappa")],
        "bid long, text string")
    mid = save_bloom(registry, bench, "text", ngram=5)
    model = load_model(registry, mid, expect_kind="bloom_bitset")
    assert model["ngram"] == 5 and model["n_grams"] >= 2
    exact_kept = {r.doc_id for r in
                  decontaminate(docs, bench, "doc_id", "text",
                                ngram=5).collect()}
    saved_kept = {r.doc_id for r in
                  bloom_decontaminate_saved(docs, model, "doc_id",
                                            "text").collect()}
    # no false negatives: everything the bloom keeps, exact keeps
    assert saved_kept <= exact_kept
    # and on this tiny gram universe there is no fp either
    assert saved_kept == exact_kept == {3, 4}
    # the lens path: model_id + registry, no benchmark argument
    spec = {"lenses": [{"name": "bloom_decontaminate", "arguments": {
        "id": "doc_id", "column": "text", "model_id": mid,
        "registry": str(registry.root)}}]}
    assert {r.doc_id for r in engine.append(docs, spec).collect()} \
        == saved_kept
    # idempotent save -> same artifact id
    assert save_bloom(registry, bench, "text", ngram=5) == mid
    # kind mismatch is loud
    vid = save_vocab(registry, docs, "text", vocab_size=4)
    with pytest.raises(LensError, match="needs 'bloom_bitset'"):
        spec_bad = {"lenses": [{"name": "bloom_decontaminate",
                                "arguments": {"id": "doc_id",
                                              "column": "text",
                                              "model_id": vid,
                                              "registry": str(registry.root)}}]}
        engine.append(docs, spec_bad)
    # corrupt bitset length is loud
    bad = dict(model)
    bad["m_bits"] = int(model["m_bits"]) * 2
    with pytest.raises(LensError, match="corrupt"):
        bloom_decontaminate_saved(docs, bad, "doc_id", "text").collect()
    # a probe-kernel change without an artifact rebuild is loud, not a
    # silent mis-filter (hash_scheme is pinned in the envelope, r11)
    stale = dict(model)
    stale["hash_scheme"] = "km-mult-v0"
    with pytest.raises(LensError, match="probe-hash scheme"):
        bloom_decontaminate_saved(docs, stale, "doc_id", "text").collect()


def test_bloom_probe_sequence_uses_high_bits():
    """Regression for the r11 bloom kernel fix: with the original
    ``h * odd_const | 1`` stride, the probe sequence mod power-of-two m
    depended ONLY on the low bits of h, so any low-bits collision
    between a probe gram and any inserted gram was a guaranteed false
    positive (effective fp ≈ n/m per gram no matter how many probes —
    ~1%/gram at bits_per_gram=48, which is how s8_saved_bloom's exact
    oracle caught it). Pin both halves of the fix:

    1. two hashes agreeing on the low 32 bits must still produce
       DIFFERENT probe sequences (stride pulls in high bits);
    2. the measured fp rate over disjoint random probes sits near the
       designed 0.5^k bound — i.e. zero hits at default sizing — not
       near n/m.
    """
    import numpy as np

    from lens_spark.operators.dedup import (
        _bloom_stride,
        _build_bloom_bitset,
    )

    rng = np.random.default_rng(7)
    inserted = rng.integers(0, 2**63, size=4096, dtype=np.int64) \
                  .view(np.uint64)
    bitset, m_bits, k = _build_bloom_bitset(inserted, 12)

    # (1) low-bits twins diverge: same low 32 bits, different high bits
    twins_lo = inserted[:256]
    twins_hi = twins_lo ^ (np.uint64(0xDEADBEEF) << np.uint64(32))
    assert not np.any(_bloom_stride(twins_lo) == _bloom_stride(twins_hi))

    # (2) fp rate at the design bound, not at n/m: probe 100k fresh
    # hashes disjoint from the inserted set
    probes = rng.integers(0, 2**63, size=100_000,
                          dtype=np.int64).view(np.uint64)
    probes = probes[~np.isin(probes, inserted)]
    h2 = _bloom_stride(probes)
    hit = np.ones(len(probes), dtype=bool)
    for i in range(k):
        idx = (probes + np.uint64(i) * h2) & np.uint64(m_bits - 1)
        byte = bitset[(idx >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
    fp = hit.mean()
    # old kernel measured ~n/m ≈ 0.06 here; the design bound is
    # ~0.5^k ≈ 2e-3 at k≈9 — allow a loose 10x margin over design
    assert fp < 0.02, f"bloom fp rate {fp:.4f} regressed toward n/m"


def test_multinomial_lang_fit_matches_ovr_quality(spark, registry):
    """r10 verdict #6: the one-pass softmax trainer (iters corpus
    passes total) must be a drop-in for the OVR loop (L x iters
    passes) — same artifact envelope, equivalent accuracy on the
    fixture corpus, and near-total prediction agreement. Weights are
    NOT compared (different losses); predictions are the contract."""
    from pyspark.sql import functions as F

    from lens_spark.models import load_model, save_lang_id

    corpus = _labeled_corpus(spark)
    n = corpus.count()
    preds = {}
    for method in ("multinomial", "ovr"):
        mid = save_lang_id(registry, corpus, "lang", "text",
                           method=method, num_buckets=512, iters=15,
                           lr=2.0)
        env = load_model(registry, mid, expect_kind="lang_classifier")
        assert sorted(env["models"]) == sorted(env["langs"])
        assert all(len(m["weights"]) == env["num_buckets"]
                   for m in env["models"].values())
        spec = {"lenses": [{"name": "lang_id", "arguments": {
            "id": "doc_id", "column": "text", "model_id": mid,
            "registry": str(registry.root)}}]}
        scored = engine.append(corpus, spec)
        acc = scored.filter(
            F.col("pred_lang") == F.col("lang")).count() / n
        assert acc >= 0.95, (method, acc)
        preds[method] = {r["doc_id"]: r["pred_lang"]
                         for r in scored.select("doc_id",
                                                "pred_lang").collect()}
    agree = sum(preds["multinomial"][d] == preds["ovr"][d]
                for d in preds["ovr"]) / n
    assert agree >= 0.95, agree


def test_classifier_fit_multinomial_contract(spark):
    """Direct trainer contract: <2 classes refused; rows with labels
    outside the requested set do not train (the per-class weight
    vectors only see listed labels); per-class interchange shape."""
    import pytest as _pytest

    from lens_spark.errors import LensError
    from lens_spark.operators.text import classifier_fit_multinomial

    df = spark.createDataFrame(
        [(1, "aa", "foo bar"), (2, "bb", "baz qux"),
         (3, "cc", "zip zap")], "id long, y string, text string")
    with _pytest.raises(LensError, match=">= 2 classes"):
        classifier_fit_multinomial(df, "y", "text", labels=["aa"])
    out = classifier_fit_multinomial(df, "y", "text",
                                     labels=["aa", "bb"],
                                     num_buckets=8, iters=2)
    assert sorted(out) == ["aa", "bb"]
    assert all(len(m["weights"]) == 8 and isinstance(m["bias"], float)
               for m in out.values())
