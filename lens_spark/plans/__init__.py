"""Plan inspection helpers — the feedback loop for scale tuning.

`explain_checks` extracts the signals the 100 TB design review cares
about from a DataFrame's physical plan: are filters pushed to the scan,
is the read schema pruned, how many exchanges (shuffles), and how much
of the plan is inside WholeStageCodegen.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    pushed_filters: list[str]
    read_schema: str | None
    num_exchanges: int
    num_codegen_stages: int
    has_python_stage: bool
    formatted: str

    def summary(self) -> str:
        return (
            f"exchanges={self.num_exchanges} codegen_stages={self.num_codegen_stages} "
            f"python={self.has_python_stage} pushed={len(self.pushed_filters)} "
            f"schema={self.read_schema or '-'}"
        )


def explain_checks(df: DataFrame) -> PlanReport:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_filters = [p.strip() for grp in pushed for p in grp.split(",") if p.strip()]
    schema_m = re.search(r"ReadSchema: (\S+)", plan)
    return PlanReport(
        pushed_filters=pushed_filters,
        read_schema=schema_m.group(1) if schema_m else None,
        num_exchanges=len(re.findall(r"\bExchange\b", plan)),
        num_codegen_stages=len(re.findall(r"WholeStageCodegen", plan)),
        has_python_stage=bool(re.search(r"(MapInPandas|ArrowEvalPython|BatchEvalPython)", plan)),
        formatted=plan,
    )
