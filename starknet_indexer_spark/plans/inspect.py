"""Helpers to interrogate a DataFrame's physical plan as text.

Built on ``explainString`` (the same rendering ``.explain("formatted")``
prints) — string-level checks are intentionally coarse: they assert
*that* a property holds (a filter was pushed, a join broadcasts), not
the exact operator tree, so plans are free to improve.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def without_aqe(spark: SparkSession):
    """Plan without the AdaptiveSparkPlan wrapper — AQE hides codegen
    and final join strategy until execution; static plans expose them
    to inspection. Build the DataFrame *inside* this context."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters list in the plan, one string per
    scan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_formatted(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per scan — narrow these, or the
    scan reads columns the query never uses."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", explain_formatted(df))
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df) or "BroadcastNestedLoopJoin" in explain_formatted(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Uses explain mode 'codegen' — under AQE the formatted plan
    doesn't annotate codegen stages before execution."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", qe.explainString(mode))
    return bool(m) and int(m.group(1)) > 0


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges). The
    scale budget of a query: every one is a full network repartition of
    its input at 100 TB."""
    plan = explain_formatted(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))
