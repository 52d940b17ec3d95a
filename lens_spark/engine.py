"""Pipeline engine: compose lens stages over a DataFrame.

≙ engine.Append (/root/reference/host-go/engine/engine.go:25-49): zero
lenses is the identity, N lenses chain in declared order. Evaluation is
lazy — ``append`` only builds the DataFrame logical plan; nothing runs
until an action (≙ config.Load "does not enumerate the src",
/root/reference/host-go/config/config.go:16-18). Reset (E5) is implicit:
DataFrames are immutable, so re-running the plan IS reset.

Fusion pass (P2 analogue, /root/reference/host-go/engine/pipes/fromPipe.go):
adjacent ``python_udf`` stages are composed into ONE mapInPandas stage,
so a chain of K python lenses crosses the JVM↔Python Arrow boundary
once. Native lens chains need no help — Catalyst/WholeStageCodegen
fuses them for free.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame

from lens_spark.errors import LensError
from lens_spark.model import LensConfig, LensModule
from lens_spark.operators.base import Lens, make_lens

# Lenses whose reference counterparts carry mutable per-instance state
# across items. Repeating one with IDENTICAL arguments in a single spec
# is the reference's shared-instance pattern (one module appended twice
# keeps counting across both stages —
# /root/reference/host-go/engine/tests/wasm32_pipeline_with_state_test.go:15-100);
# this engine re-derives state per stage, so that pattern would silently
# produce different numbers. We refuse it instead (SURVEY.md §7.4d).
# Index-backed lenses (dedup_incremental, neardup_incremental) are NOT
# listed: their state lives in the external index path, which IS shared
# across stages, matching the reference semantics.
_STATEFUL_LENSES = {"counter"}


def _check_shared_state(config: LensConfig) -> None:
    seen: set[tuple[str, str]] = set()
    for m in config.lenses:
        if m.name not in _STATEFUL_LENSES:
            continue
        key = (m.name, json.dumps(dict(m.arguments), sort_keys=True, default=str))
        if key in seen:
            raise LensError(
                f"lens '{m.name}' appears more than once with identical "
                "arguments in one pipeline: the reference engine shares a "
                "single stateful module instance across such stages (its "
                "counter keeps counting), while this engine derives state "
                "per stage — a documented divergence (SURVEY.md §7.4d). "
                "Give each stage distinct arguments (e.g. a different "
                "'out' column) or use a single stage."
            )
        seen.add(key)


def _coerce_config(spec: Any) -> LensConfig:
    if isinstance(spec, LensConfig):
        return spec
    if isinstance(spec, LensModule):
        return LensConfig([spec])
    if isinstance(spec, Mapping):
        return LensConfig.from_dict(spec)
    if isinstance(spec, str):
        return LensConfig.from_json(spec)
    if isinstance(spec, Iterable):
        return LensConfig(
            m if isinstance(m, LensModule) else LensModule.from_dict(m) for m in spec
        )
    raise TypeError(f"cannot build a LensConfig from {type(spec).__name__}")


def _instantiate(config: LensConfig) -> list[tuple[LensModule, Lens]]:
    return [(m, make_lens(m.name, m.arguments)) for m in config.lenses]


def _fuse_python_stages(stages: list[tuple[LensModule, Lens]]):
    """Group consecutive fusable python stages; pass others through."""
    from lens_spark.operators.udf import compose_batch_fns

    grouped: list[Any] = []
    run: list[tuple] = []  # (fn, params, schema) triples

    def flush():
        nonlocal run
        if not run:
            return
        if len(run) == 1:
            fn, params, schema = run[0]
            grouped.append(("python", compose_batch_fns([(fn, params)]), schema))
        else:
            final_schema = run[-1][2]
            grouped.append(
                ("python", compose_batch_fns([(fn, params) for fn, params, _ in run]),
                 final_schema)
            )
        run = []

    for module, lens in stages:
        fusable = lens.fusable_iter_inverse if module.inverse else lens.fusable_iter
        if fusable is not None:
            run.append(fusable)
        else:
            flush()
            grouped.append(("lens", module, lens))
    flush()
    return grouped


def append(df: DataFrame, spec: Any) -> DataFrame:
    """Apply a pipeline spec to ``df`` lazily. ≙ E1/E6.

    ``spec`` may be a LensConfig, dict, JSON string, LensModule, or an
    iterable of modules. Zero modules → identity.
    """
    return Pipeline(_coerce_config(spec)).apply(df)


def transform(df: DataFrame, spec: Any) -> DataFrame:
    """Alias of append (the Store.Transform spelling, store.go:194-205)."""
    return append(df, spec)


def invert(spec: Any) -> LensConfig:
    """E8 pipeline inversion: reverse order, flip each inverse flag
    (/root/reference/host-go/repository/repository.go:172-206)."""
    return _coerce_config(spec).inverted()


def inverse(df: DataFrame, spec: Any) -> DataFrame:
    """Apply the inverted pipeline (Store.Inverse, store.go:207-218)."""
    return append(df, invert(spec))


class Pipeline:
    """A compiled, reusable pipeline — apply it to any input DataFrame.

    ≙ E9/E10: the reference pools pre-built pipelines and swaps their
    source socket per use (repository.go:281-324, 359-403). Here the
    expensive part (spec parsing + lens instantiation) happens once in
    ``compile``; each ``apply`` just replays the cheap plan-building
    closures against a new source.
    """

    def __init__(self, config: LensConfig) -> None:
        _check_shared_state(config)
        self.config = config
        self._stages = _fuse_python_stages(_instantiate(config))

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        for kind, *rest in self._stages:
            if kind == "python":
                fused_fn, schema = rest
                out = out.mapInPandas(fused_fn, schema=schema)
            else:
                module, lens = rest
                out = lens.inverse(out) if module.inverse else lens.forward(out)
        return out

    __call__ = apply

    def inverted(self) -> "Pipeline":
        return Pipeline(self.config.inverted())

    def content_id(self) -> str:
        return self.config.content_id()


def compile(spec: Any) -> Pipeline:  # noqa: A001 (mirrors module-compile, E4)
    """Parse + instantiate once; reuse across inputs (E9/E10)."""
    return Pipeline(_coerce_config(spec))


def compose(*specs: Any) -> LensConfig:
    """Concatenate pipelines into one config."""
    modules: list[LensModule] = []
    for spec in specs:
        modules.extend(_coerce_config(spec).lenses)
    return LensConfig(modules)
