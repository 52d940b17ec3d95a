"""Error types.

The reference carries errors in-band as `TypeId=-1` frames that become
host errors at Value() time (host-go/engine/pipes/fromSource.go:68-70).
Our strict-mode analogue is a raised ``LensError`` (task failure); the
permissive-mode analogue (an ``_error`` string column) is provided by
the python_udf lens wrapper in lens_spark.operators.udf.
"""

from __future__ import annotations


class LensError(Exception):
    """An error raised by a lens (pipeline stage) or the engine."""


class LensNotFoundError(LensError):
    """Unknown built-in lens name / unresolvable module path."""


class ConcurrentIndexWriterError(LensError):
    """Another writer holds an incremental-dedup index's writer lock.

    The incremental dedup flow is read-index → dedup → append-index;
    two concurrent writers would each dedup against the pre-append
    index and both accept the same (near-)duplicates — a lost update
    the append itself cannot detect. Ingest jobs sharing an index must
    serialize; this error is the engine refusing to corrupt the index.
    """


class InvalidLensIdError(LensError):
    """A registry id that is not a valid content id.

    Mirrors the reference's assertIsCid (host-go/store/store.go:284-287):
    malformed ids are an error, while *well-formed but unknown* ids fall
    through to the identity transform (host-go/repository/repository.go:250-254).
    """


class EmptyIndexError(LensError):
    """A directory that is not (or not yet) a persistent index: no
    ``parts/`` dataset and no ``model.json``. Benign for maintenance
    sweeps — a bootstrapped-but-never-written index root is skipped,
    not reported as an error. Typed (rather than matched on message
    text) so a rewording of the message can never silently reclassify
    empty indexes as failures."""


class InterruptedRewriteError(LensError):
    """An index whose last rewrite crashed (or is concurrently running)
    mid-swap: ``parts/`` is staged aside and classification by schema
    is impossible until a family compactor — or any writing call —
    rolls the swap forward. Typed so ``compact_any`` can retry
    recovery + classification once instead of reporting a transient
    concurrent-writer gap as an index error."""
