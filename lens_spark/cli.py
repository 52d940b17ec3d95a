"""CLI: ``python -m lens_spark.cli <lensfile.json> [< in.json] [> out.json]``

Reproduces the reference CLI (/root/reference/host-go/cli/main.go):
read a JSON array of documents from stdin, apply the lens file, write
the transformed JSON array to stdout. Extras (Spark-native surface):
``--input/--output`` parquet/json paths, ``--inverse``.
"""

from __future__ import annotations

import argparse
import json
import sys

from lens_spark import engine
from lens_spark.model import LensConfig
from lens_spark.session import get_spark


def main(argv: list[str] | None = None, *, _stop_session: bool = True) -> int:
    """``_stop_session=False`` lets tests drive the CLI in-process
    without tearing down their shared SparkSession."""
    parser = argparse.ArgumentParser(prog="lens_spark")
    parser.add_argument("lensfile", help="pipeline spec JSON (lens file)")
    parser.add_argument("--input", help="input path (parquet/json/jsonl/csv/orc); default stdin JSON array")
    parser.add_argument("--output", help="output path (parquet/json/jsonl/csv/orc); default stdout JSON array")
    parser.add_argument("--format", default=None,
                        choices=["parquet", "json", "csv", "orc"],
                        help="fallback format when a path's extension doesn't decide")
    parser.add_argument("--inverse", action="store_true",
                        help="apply the inverted pipeline (E8)")
    parser.add_argument("--allow-module-paths", action="store_true",
                        help="opt in to executing file:/data: Python lens "
                             "modules referenced by the lens file")
    parser.add_argument("--allow-http-modules", action="store_true",
                        help="additionally opt in to FETCHING http(s): lens "
                             "modules (sha256 pinned on first use, "
                             "re-verified on every later fetch; implies "
                             "nothing about execution — --allow-module-paths "
                             "is still required)")
    parser.add_argument("--explain", action="store_true",
                        help="print the optimized physical plan instead of "
                             "executing (plan review before a large run)")
    args = parser.parse_args(argv)

    if args.allow_module_paths:
        from lens_spark.modules import allow_module_paths

        allow_module_paths(True)
    if args.allow_http_modules:
        from lens_spark.modules import allow_http_modules

        allow_http_modules(True)
    spec = LensConfig.load(args.lensfile)
    if args.inverse:
        spec = spec.inverted()

    spark = get_spark("lens_spark.cli")
    try:
        def path_format(path: str) -> str:
            for ext, fmt in ((".jsonl", "json"), (".json", "json"),
                             (".parquet", "parquet"), (".csv", "csv"),
                             (".orc", "orc")):
                if path.endswith(ext):
                    return fmt
            return args.format or "parquet"

        had_nil = False
        if args.input:
            reader = spark.read.format(path_format(args.input))
            if path_format(args.input) == "csv":
                # header + schema inference: the CLI contract is typed
                # documents, not all-string rows
                reader = reader.option("header", True).option("inferSchema", True)
            df = reader.load(args.input)
        else:
            docs = json.load(sys.stdin)
            if not isinstance(docs, list):
                raise SystemExit("stdin must be a JSON array of documents")
            # Nil items (JSON null) are first-class in the reference
            # (TypeId=0; cli/simple_test.go:168-218) — our row convention
            # is the all-null row (SURVEY.md §1.6): {} contributes no
            # fields, so every field is null. Nil-ness rides in a hidden
            # per-row flag so a nil input maps back to exactly one nil
            # output — an input {} (or a row whose fields all became
            # null) is NOT conflated with nil. The __lens_ prefix is
            # reserved engine metadata: python batch-fns never see such
            # columns (udf._strip_meta). Dedup identity keeps the nil
            # flag itself (dedup._identity_columns) — nil is a distinct
            # item kind, so a nil row and a genuine all-null document
            # never collapse into one survivor — while other transient
            # meta columns stay out of identity, so a spec behaves the
            # same through the CLI and the library API.
            had_nil = any(d is None for d in docs)
            if not docs or all(d is None or d == {} for d in docs):
                json.dump([None if d is None else {} for d in docs], sys.stdout)
                print()
                return 0
            docs = [dict(({} if d is None else d), __lens_nil=(d is None))
                    for d in docs]
            df = spark.createDataFrame(docs)

        out = engine.append(df, spec)

        if args.explain:
            print(out._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
            return 0

        if args.output:
            if "__lens_nil" in out.columns:
                out = out.drop("__lens_nil")
            writer = out.write.format(path_format(args.output)).mode("overwrite")
            if path_format(args.output) == "csv":
                writer = writer.option("header", True)
            writer.save(args.output)
        else:
            rows = [json.loads(r) for r in out.toJSON().collect()]
            if "__lens_nil" in out.columns:
                rows = [None if r.pop("__lens_nil", False) else r for r in rows]
            elif had_nil:
                # flag column dropped by a projecting lens: fall back to
                # the all-null heuristic (toJSON drops null fields, so an
                # all-null row serializes as {})
                rows = [None if r == {} else r for r in rows]
            json.dump(rows, sys.stdout, indent=2, default=str)
            print()
        return 0
    finally:
        if _stop_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
