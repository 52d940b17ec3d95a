"""Fitted-model persistence through the content-addressed registry.

The engine's fit operators (``bpe_fit``, ``classifier_fit``,
``kmeans_fit``) return driver-held model state — KB-scale merge
tables, weight vectors, centroid matrices (the documented model-state
contract). This module gives that state the same storage the
reference gives its lens wasm modules — content-addressed, chunked,
verified registry blocks (≙ host-go/store/block.go:84-133 LensBlock):
a canonical JSON envelope saved as a ``lens1b-<sha256>`` artifact, so
fit-once/apply-many pipelines are declarable in a lens file by id:

    {"lenses": [{"name": "bpe_tokenize", "arguments": {
        "column": "text", "model_id": "lens1b-…",
        "registry": "/models/registry"}}]}

Envelope: ``{"format": "lens_spark_model", "version": 1,
"kind": <kind>, "model": <payload>}``, serialized with sorted keys and
compact separators so identical models always produce the identical
artifact id (S1 idempotence). JSON round-trips doubles exactly
(shortest-repr), so weights and centroids reload bit-identical.

Kinds and payload shapes:

- ``bpe_merges`` — ``[[a, b], …]`` in rank order (what ``bpe_fit``
  returns, tuples listified).
- ``linear_classifier`` — ``{"weights": [...], "bias": float}`` (the
  ``classifier_fit`` → ``classifier_score`` interchange format).
- ``kmeans_centroids`` — ``[[…], …]`` k×dim (what ``kmeans_fit``
  returns; ≙ MLlib KMeansModel.clusterCenters).
- ``token_vocab`` — ``{"vocab": [[token, id], …], "lowercase": bool}``
  (what ``vocab_fit`` returns, id-ascending; consumed by
  ``vocab_apply``).
- ``lang_classifier`` — ``{"langs": [...], "num_buckets": int,
  "models": {lang: {"weights": [...], "bias": float}}}`` — one-vs-rest
  linear models over the shared hashed bag-of-words featurization
  (what ``save_lang_id`` fits; consumed by the ``lang_id`` lens's
  ``model_id`` path, which scores ALL languages in one corpus pass).
- ``bloom_bitset`` — ``{"bitset_b64": str, "m_bits": int,
  "k_probes": int, "ngram": int, "shingle": str, "n_grams": int}`` —
  a benchmark-suite Bloom filter (what ``save_bloom`` builds; consumed
  by the ``bloom_decontaminate`` lens's ``model_id`` path, r10). The
  one kind whose payload scales past KBs (12 bits per distinct
  benchmark gram — MBs for real suites); the registry's chunked block
  store handles it, and serving broadcasts the same bitset the inline
  path already broadcasts.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from lens_spark.errors import LensError
from lens_spark.registry import Registry

_FORMAT = "lens_spark_model"
_VERSION = 1

MODEL_KINDS = ("bpe_merges", "linear_classifier", "kmeans_centroids",
               "token_vocab", "lang_classifier", "bloom_bitset",
               "pq_codebooks")


def _coerce_registry(registry: "Registry | str | Path") -> Registry:
    if isinstance(registry, Registry):
        return registry
    return Registry(registry)


def model_envelope(kind: str, model: Any) -> bytes:
    """Canonical serialized envelope — the content that gets addressed."""
    if kind not in MODEL_KINDS:
        raise LensError(
            f"unknown model kind {kind!r} (expected one of {MODEL_KINDS})")
    try:
        return json.dumps(
            {"format": _FORMAT, "version": _VERSION, "kind": kind,
             "model": model},
            sort_keys=True, separators=(",", ":"), ensure_ascii=False,
            allow_nan=False).encode("utf-8")
    except (TypeError, ValueError) as exc:
        raise LensError(f"model of kind {kind!r} is not JSON-serializable "
                        f"({exc}) — NaN/Inf and non-plain types are not "
                        "valid model state") from exc


def save_model(registry: "Registry | str | Path", kind: str,
               model: Any) -> str:
    """Persist model state as a content-addressed registry artifact;
    returns the ``lens1b-…`` id. Idempotent: the same model saves to
    the same id."""
    reg = _coerce_registry(registry)
    return reg.add_artifact(model_envelope(kind, model))


def load_model(registry: "Registry | str | Path", model_id: str, *,
               expect_kind: str | None = None) -> Any:
    """Load model state by artifact id (chunk-reassembled, content-
    verified by the registry). ``expect_kind`` pins the consumer's
    contract — applying a kmeans artifact where a tokenizer is
    expected is a loud error, not a silent mis-apply."""
    reg = _coerce_registry(registry)
    data = reg.get_artifact(model_id)
    try:
        env = json.loads(data.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise LensError(
            f"artifact '{model_id}' is not a model envelope ({exc})"
        ) from exc
    if not isinstance(env, dict) or env.get("format") != _FORMAT:
        raise LensError(f"artifact '{model_id}' is not a "
                        f"{_FORMAT} envelope")
    if int(env.get("version", -1)) != _VERSION:
        raise LensError(
            f"artifact '{model_id}' has model-envelope version "
            f"{env.get('version')!r}; this engine reads version "
            f"{_VERSION}")
    kind = env.get("kind")
    if kind not in MODEL_KINDS:
        raise LensError(f"artifact '{model_id}' declares unknown model "
                        f"kind {kind!r}")
    if expect_kind is not None and kind != expect_kind:
        raise LensError(
            f"artifact '{model_id}' holds a {kind!r} model, but this "
            f"lens needs {expect_kind!r}")
    return env["model"]


# -- fit-and-save conveniences ------------------------------------------------


def save_bpe(registry: "Registry | str | Path", df, text_col: str,
             **fit_kw) -> str:
    """``bpe_fit`` then persist the merge table; returns the model id."""
    from lens_spark.operators.bpe import bpe_fit

    merges = bpe_fit(df, text_col, **fit_kw)
    return save_model(registry, "bpe_merges", [list(m) for m in merges])


def save_classifier(registry: "Registry | str | Path", df,
                    label_col: str, text_col: str, **fit_kw) -> str:
    """``classifier_fit`` then persist {weights, bias}; returns the id."""
    from lens_spark.operators.text import classifier_fit

    model = classifier_fit(df, label_col, text_col, **fit_kw)
    return save_model(registry, "linear_classifier",
                      {"weights": [float(w) for w in model["weights"]],
                       "bias": float(model["bias"])})


def save_pq(registry: "Registry | str | Path", df, id_col: str,
            vec_col: str, *, dim: int, m: int = 4, nbits: int = 4,
            train_size: int = 2048, iters: int = 8) -> str:
    """Train PQ codebooks (the ``pq_topk`` recipe: deterministic
    smallest-md5(id) sample, driver-side per-subspace Lloyd's) and
    persist them as a ``pq_codebooks`` artifact; returns the id.
    ``dim``/``m``/``nbits`` travel in the envelope so the serving side
    (``similarity_topk`` method ``pq``/``ivfpq`` with ``pq_model_id``)
    can never apply codebooks with a mismatched geometry — the PQ
    sibling of ``save_kmeans``'s coarse quantizer; together they make
    IVFADC serving completely fit-free."""
    import numpy as np
    from pyspark.sql import functions as F

    from lens_spark.operators.similarity import _pq_train_codebooks

    ksub = 1 << int(nbits)
    if dim % m != 0:
        raise LensError(f"save_pq: dim={dim} not divisible by m={m}")
    sample = np.stack(
        df.withColumn("__mk", F.md5(F.col(id_col).cast("string")))
        .orderBy("__mk").limit(int(train_size))
        .select(vec_col).toPandas()[vec_col].to_numpy()).astype(np.float64)
    if sample.shape[1] != dim:
        raise LensError(
            f"save_pq: vector dim {sample.shape[1]} != dim={dim}")
    books = _pq_train_codebooks(sample, int(m), ksub, int(iters))
    return save_model(registry, "pq_codebooks", {
        "dim": int(dim), "m": int(m), "nbits": int(nbits),
        "books": [[[float(x) for x in c] for c in book]
                  for book in books]})


def save_kmeans(registry: "Registry | str | Path", df, id_col: str,
                vec_col: str, **fit_kw) -> str:
    """``kmeans_fit`` then persist the centroid matrix; returns the id."""
    from lens_spark.operators.clustering import kmeans_fit

    cent = kmeans_fit(df, id_col, vec_col, **fit_kw)
    return save_model(registry, "kmeans_centroids",
                      [[float(x) for x in c] for c in cent])


def save_vocab(registry: "Registry | str | Path", df, text_col: str,
               **fit_kw) -> str:
    """``vocab_fit`` then persist the top-V vocabulary; returns the id.
    ``lowercase`` (default True) is stored in the envelope — applying
    a vocabulary with a different tokenization than it was fitted with
    is the classic silent-OOV bug, so the apply side reads it from the
    model, not from the caller."""
    from lens_spark.operators.text import vocab_fit

    lowercase = bool(fit_kw.get("lowercase", True))
    vocab = vocab_fit(df, text_col, **fit_kw)
    return save_model(registry, "token_vocab",
                      {"vocab": [[t, i] for t, i in vocab],
                       "lowercase": lowercase})


def save_lang_id(registry: "Registry | str | Path", df, label_col: str,
                 text_col: str, *, langs: "list[str] | None" = None,
                 method: str = "multinomial", **fit_kw) -> str:
    """Fit a language classifier over the shared hashed bag-of-words
    featurization and persist the whole model family as ONE
    ``lang_classifier`` artifact; returns the model id.

    ``method="multinomial"`` (default since r11, r10 verdict #6) fits
    one softmax model for all L languages via
    ``classifier_fit_multinomial`` — ``iters`` corpus passes TOTAL.
    ``method="ovr"`` keeps the round-10 one-vs-rest trainer (one
    ``classifier_fit`` logistic regression per language) — L ×
    ``iters`` passes, 64× the fit-side scan I/O at the L=64 bound;
    both produce the identical artifact envelope (per-language
    {weights, bias}), so the one-pass scorer serves either.

    ``langs`` defaults to the distinct non-null labels in
    ``label_col`` (sorted — the alphabetical order is also the
    prediction tie-break contract). This is the fit-once side — the
    100 TB scoring pass loads the artifact and touches the corpus
    exactly once (see the ``lang_id`` lens ``model_id`` path)."""
    from pyspark.sql import functions as F

    from lens_spark.operators.text import (
        classifier_fit,
        classifier_fit_multinomial,
    )

    if method not in ("multinomial", "ovr"):
        raise LensError(
            f"save_lang_id: unknown method {method!r} "
            "(multinomial|ovr)")
    if langs is None:
        langs = sorted(
            r[0] for r in df.select(label_col).distinct().collect()
            if r[0] is not None)
    langs = [str(lg) for lg in langs]
    if not langs:
        raise LensError("save_lang_id: no languages to fit")
    if len(langs) > 64:
        raise LensError(
            f"save_lang_id: {len(langs)} languages — the one-pass "
            "scorer widens the broadcast weight table by one column "
            "per language; 64 is the sanity bound")
    nb = int(fit_kw.get("num_buckets", 1024))
    if method == "multinomial" and len(langs) >= 2:
        models = classifier_fit_multinomial(
            df, label_col, text_col, labels=langs, **fit_kw)
    else:  # ovr, or a single-language degenerate fit
        models = {}
        for lg in langs:
            labeled = df.withColumn(
                "__ovr_y", (F.col(label_col) == F.lit(lg)).cast("int"))
            models[lg] = classifier_fit(labeled, "__ovr_y", text_col,
                                        **fit_kw)
    return save_model(registry, "lang_classifier",
                      {"langs": langs, "num_buckets": nb,
                       "models": models})


def save_bloom(registry: "Registry | str | Path", benchmark, text_col: str,
               *, ngram: int = 8, shingle: str = "word",
               bits_per_gram: int = 12,
               max_driver_grams: int = 50_000_000) -> str:
    """Build the benchmark-suite Bloom bitset ONCE (same distinct
    gram-hash scan and filter construction as ``bloom_decontaminate``)
    and persist it as a ``bloom_bitset`` artifact; returns the id.
    The recurring corpus job applies it by ``model_id`` with no
    benchmark scan at all (``bloom_decontaminate_saved`` — see its
    documented no-confirm fp contract). ngram/shingle are stored in
    the envelope so probing always matches the fit tokenization."""
    import base64

    import numpy as np

    from lens_spark.operators.dedup import (
        BLOOM_HASH_SCHEME,
        _bench_gram_hashes,
        _build_bloom_bitset,
        _collect_bench_gram_hashes,
    )

    bench_grams = _bench_gram_hashes(benchmark, text_col, ngram, shingle)
    hashes = _collect_bench_gram_hashes(
        bench_grams, max_driver_grams, "save_bloom").view(np.uint64)
    bitset, m_bits, k_probes = _build_bloom_bitset(hashes, bits_per_gram)
    return save_model(registry, "bloom_bitset", {
        "bitset_b64": base64.b64encode(bitset.tobytes()).decode("ascii"),
        "m_bits": int(m_bits), "k_probes": int(k_probes),
        "ngram": int(ngram), "shingle": str(shingle),
        "n_grams": int(len(hashes)),
        "hash_scheme": BLOOM_HASH_SCHEME})


def load_bpe_merges(registry: "Registry | str | Path",
                    model_id: str) -> list[tuple[str, str]]:
    raw = load_model(registry, model_id, expect_kind="bpe_merges")
    return [(str(a), str(b)) for a, b in raw]
