"""Column-expression helpers shared by operators, queries, and oracles.

Everything here is a pure Catalyst expression (JVM-side, codegen'd) —
no Python in the data path. Where a helper backs an oracle-checked
query, the construction is deliberately chosen so the *identical*
computation is expressible in DuckDB SQL (md5 hex strings as the hash
domain, lexicographic min as the minhash order), making results
engine-independent and hash-comparable.
"""

from lens_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_scores,
    predict_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
    whitespace_token_count,
)
from lens_spark.functions.hashing import (
    band_hashes,
    char_shingles,
    jaccard_shingles,
    minhash_signature,
    simhash60,
)
from lens_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "band_hashes",
    "bpe_ish_token_count",
    "char_shingles",
    "cosine_similarity",
    "dot",
    "fingerprint",
    "jaccard_shingles",
    "l2_norm",
    "lang_scores",
    "minhash_signature",
    "predict_lang",
    "punct_ratio",
    "quality_score",
    "simhash60",
    "stopword_ratio",
    "tokens",
    "whitespace_token_count",
]
