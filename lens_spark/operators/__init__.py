"""Built-in lens operator library.

Importing this package registers all built-in lenses. Modules:
  core      — M1-M7 archetypes + schema-migration helpers (Catalyst-native)
  counter   — M5 stateful sequence assignment (distributed two-pass)
  udf       — python_udf escape hatch (mapInPandas, Arrow-batched, fusable)
  dedup     — X1/X2 exact + MinHash-LSH / SimHash / n-gram Jaccard near-dup
  similarity— X3 embedding cosine top-k (brute force + LSH-bucketed ANN)
  text      — X5 language-id, quality scoring, token counts, fingerprints
  multimodal— X4 binary media columns: decode/feature plumbing (stubbed codecs)
  relational— join / aggregate / window / sort / limit / set ops (§2.6 built-ins)
  temporal  — as-of join, gap sessionization, session windows (batch+stream)
  clustering— X3 ext: distributed Lloyd's k-means + SemDedup semantic dedup
  selection — X7 ext: DSIR importance weighting + Gumbel-top-k resampling
  evaluation— classifier eval: exact rank-statistic AUC + confusion metrics
"""

from lens_spark.operators.base import (
    Lens,
    builtin_names,
    make_lens,
    register_lens,
)
from lens_spark.operators import core as _core  # noqa: F401  (registers lenses)
from lens_spark.operators import counter as _counter  # noqa: F401
from lens_spark.operators import udf as _udf  # noqa: F401
from lens_spark.operators.udf import per_item, register_grouped_lens, register_python_lens
from lens_spark.operators import dedup as _dedup  # noqa: F401
from lens_spark.operators import similarity as _similarity  # noqa: F401
from lens_spark.operators import text as _text  # noqa: F401
from lens_spark.operators import multimodal as _multimodal  # noqa: F401
from lens_spark.operators import relational as _relational  # noqa: F401
from lens_spark.operators import temporal as _temporal  # noqa: F401
from lens_spark.operators import sampling as _sampling  # noqa: F401
from lens_spark.operators import ranking as _ranking  # noqa: F401
from lens_spark.operators import packing as _packing  # noqa: F401
from lens_spark.operators import clustering as _clustering  # noqa: F401
from lens_spark.operators import selection as _selection  # noqa: F401
from lens_spark.operators import evaluation as _evaluation  # noqa: F401
from lens_spark.operators import chat as _chat  # noqa: F401
from lens_spark.operators import bpe as _bpe  # noqa: F401

__all__ = [
    "Lens",
    "builtin_names",
    "make_lens",
    "register_lens",
    "register_grouped_lens",
    "register_python_lens",
    "per_item",
]
