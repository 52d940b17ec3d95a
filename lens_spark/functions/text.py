"""Text-analysis expressions: tokenization, counting, quality, lang-id,
fingerprinting. All pure Catalyst expressions; every helper that backs
an oracle query has an exact DuckDB-SQL twin (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword marker sets per language. The goal is a
# reproducible heuristic (same answer in Spark and the SQL oracle), not
# linguistic accuracy — swap in real profiles (e.g. CLD3-style n-gram
# tables) for production corpora.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}

# "BPE-ish" token pattern: runs of word chars OR single non-space symbols
# — approximates subword pre-tokenization without a vocab file.
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
PUNCT_PATTERN = r"[^\w\s]"


def let_(value: Column, body) -> Column:
    """Bind ``value`` ONCE per row and evaluate ``body`` against it.

    Catalyst has no common-subexpression sharing across an interpreted
    expression tree: referencing a Column twice embeds (and evaluates)
    its whole subtree twice, and a filter pushed below a projection
    re-inlines every aliased metric it references. Wrapping the value
    in a one-element array and reading it back through a higher-order
    ``transform`` lambda variable gives a true let-binding — the
    subtree is evaluated once per row no matter how many times the
    body references it. (This took ``quality_filter`` from ~11 s to
    sub-second at sf0.1: the pushed-down condition was re-tokenizing
    and re-sorting per predicate.)
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens(text: Column, *, lowercase: bool = True) -> Column:
    """Whitespace tokens, empty strings removed."""
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text, lowercase=False)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("bigint")


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), 0))
    return F.when(F.length(text) > 0,
                  n_punct.cast("double") / F.length(text).cast("double")
                  ).otherwise(F.lit(0.0))


def stopword_ratio_of(toks: Column,
                      markers: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Stopword ratio over an existing token array."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, markers: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    # let-bound: the ratio references the token array three times
    return let_(tokens(text), lambda tk: stopword_ratio_of(tk, markers))


def lang_scores_of(toks: Column) -> dict[str, Column]:
    """Marker-hit count per language over an existing token array."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (over whitespace tokens). Each
    returned column tokenizes independently — for several scores in one
    projection, materialize a tokens column and use lang_scores_of."""
    return lang_scores_of(tokens(text))


def predict_lang_of(toks: Column, *, default: str = "und") -> Column:
    """argmax language by marker hits over an existing token array;
    ties broken by language-code order; all-zero → ``default``."""
    scores = lang_scores_of(toks)
    ordered = sorted(scores)  # deterministic tie-break: alphabetical
    best_score = F.greatest(*[scores[lang] for lang in ordered])
    expr = F.lit(default)
    for lang in reversed(ordered):
        expr = F.when((best_score > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(expr)
    return expr


def predict_lang(text: Column, *, default: str = "und") -> Column:
    """argmax language by marker hits; ties broken by language-code order;
    all-zero → ``default``. Let-bound: the naive form tokenizes once per
    language score per reference (6 scores × 2 references each)."""
    return let_(tokens(text), lambda tk: predict_lang_of(tk, default=default))


def quality_score_of(text: Column, toks: Column) -> Column:
    """Quality heuristic with the token array supplied by the caller
    (for projections that compute several token metrics at once)."""
    length = F.length(text).cast("double")
    len_component = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio_of(toks) * 4.0, F.lit(1.0))
    score = (len_component * 0.4 + punct_component * 0.3 + stop_component * 0.3)
    return F.round(score, 6)


def quality_score(text: Column) -> Column:
    """Deterministic 0..1 quality heuristic: rewards mid-length docs and
    word-like content, penalizes punctuation soup. Rounded to 6dp so the
    double is hash-stable across engines. (The stopword component's
    tokenize is let-bound via stopword_ratio.)"""
    length = F.length(text).cast("double")
    len_component = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    score = (len_component * 0.4 + punct_component * 0.3 + stop_component * 0.3)
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over case/whitespace-normalized text.
    Identical in DuckDB: md5(trim(regexp_replace(lower(text),'\\s+',' ','g')))."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


# ---------------------------------------------------------------------------
# Repetition / diversity metrics (Gopher-style quality rules). All pure
# Catalyst list expressions with exact DuckDB twins (list_transform /
# list_filter / list_distinct lambdas), so the filter thresholds can be
# oracle-checked value-for-value. Per-row cost is O(tokens · distinct
# tokens) for the top-fraction metrics — bounded by document length,
# embarrassingly parallel, no shuffle.
# ---------------------------------------------------------------------------

def mean_word_length_of(toks: Column) -> Column:
    """Mean token length over a token array (0.0 for empty docs)."""
    total = F.aggregate(toks, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    """Mean token length over whitespace tokens (0.0 for empty docs).

    Lengths are measured on LOWERCASED tokens (``tokens()`` default),
    matching the DuckDB oracle, which always lowercases. For Unicode
    where case-mapping changes codepoint count (e.g. 'İ' → 'i̇') this
    differs from the raw-token length; a round-3 change — the previous
    behavior measured raw tokens."""
    return mean_word_length_of(tokens(text))


def unique_token_ratio_of(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens."""
    return F.when(F.size(toks) > 0,
                  F.size(F.array_distinct(toks)).cast("double")
                  / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def unique_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens (lowercased)."""
    return unique_token_ratio_of(tokens(text))


def top_fraction_of(items: Column) -> Column:
    """Fraction of the list covered by its most frequent element.

    Sort, find the run boundaries (positions where sorted neighbors
    differ), and take the longest gap between consecutive boundaries —
    the longest equal-run of the sorted list IS the top frequency.
    O(n log n) per row with one string comparison per adjacent pair.
    The earlier struct-accumulator fold evaluated its run counter
    twice per element and allocated a struct per step; before that, a
    distinct→filter→count mapping was O(distinct·n) and ~25× slower
    end-to-end. Both the sorted array and the boundary list are
    let_-bound: HOF trees re-evaluate per reference otherwise.
    """

    def from_sorted(arr: Column) -> Column:
        n = F.size(arr)
        # 1-indexed positions where a run ends; n>=2 guard because
        # sequence(1, 0) would count DOWN, not produce an empty range
        bounds = F.when(
            n >= 2,
            F.filter(F.sequence(F.lit(1), n - 1),
                     lambda i: F.element_at(arr, i) != F.element_at(arr, i + 1)),
        ).otherwise(F.array().cast("array<int>"))

        def best_run(ends: Column) -> Column:
            starts = F.concat(F.array(F.lit(0)),
                              F.slice(ends, 1, F.size(ends) - 1))
            return F.array_max(F.zip_with(ends, starts, lambda e, s: e - s))

        best = let_(F.concat(bounds, F.array(n)), best_run)
        return F.when(n > 0, best.cast("double") / n.cast("double")
                      ).otherwise(F.lit(0.0))

    return let_(F.array_sort(items), from_sorted)


def bigrams_of(toks: Column) -> Column:
    """Adjacent bigrams of a token array, joined with one space."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                          F.element_at(toks, i + 1))),
    ).otherwise(F.array().cast("array<string>"))


def bigrams(text: Column) -> Column:
    """Adjacent lowercased token bigrams joined with one space."""
    return bigrams_of(tokens(text))


def top_token_fraction(text: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token —
    high values flag keyword-stuffed / repetitive documents."""
    return top_fraction_of(tokens(text))


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of bigrams taken by the most frequent bigram."""
    return top_fraction_of(bigrams(text))


# ---------------------------------------------------------------------------
# PII redaction. Pattern set is deliberately RE2-and-Java-compatible
# (no backreferences/lookaround, unambiguous shapes) so the Spark
# expression and the DuckDB oracle replace the exact same spans.
# Applied in a fixed order — email before phone so the digits of a
# mailbox name never half-match a later pattern.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # card before ssn/phone, intl_phone before phone (r9): the more
    # specific shape must consume its span whole, or a later pattern
    # redacts a fragment of it ("+1-555-123-4567" would otherwise
    # leave "+1-[PHONE]")
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("intl_phone", r"\+\d{1,3}[- ]\d{2,4}[- ]\d{3,4}[- ]\d{3,4}\b",
     "[PHONE]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("ipv6", r"\b[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){7}\b", "[IP]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its category token."""
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII span counts (before redaction)."""
    return {name: F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")
            for name, pattern, _ in PII_PATTERNS}


# ---------------------------------------------------------------------------
# URL canonicalization. Patterns are RE2-and-Java-compatible and each
# matches at most once per URL (anchored), so Spark's replace-all and
# DuckDB's replace-first semantics agree and the oracle reproduces the
# canonical form byte-for-byte.
# ---------------------------------------------------------------------------

def normalize_url(url: Column) -> Column:
    """Canonical URL dedup key: lowercase; scheme and leading ``www.``
    stripped; query string and fragment dropped (the standard
    crawl-pipeline canonicalization — tracking params make raw URLs
    near-unique); trailing slash trimmed. Narrow expression."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return F.regexp_replace(u, r"/$", "")


def url_domain(url: Column) -> Column:
    """Registrable host of a (raw or canonical) URL."""
    return F.regexp_extract(normalize_url(url), r"^([^/]+)", 1)
