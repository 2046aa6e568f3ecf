"""Plan-string extraction and structural predicates over Spark plans."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text of ``df.explain(mode)`` as a string (classic PySpark)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    text = explain_string(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings per scan — the columns actually read from parquet."""
    text = explain_string(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", text)]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast exchanges
    excluded — those are the cheap kind)."""
    text = explain_string(df, "formatted")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", text))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df, "formatted") or (
        "BroadcastNestedLoopJoin" in explain_string(df, "formatted")
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: a HashAggregate pair (partial + final)."""
    text = explain_string(df, "formatted")
    return len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", text)) >= 2


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider/more is better — more of
    the plan runs as generated JVM code). Uses codegen explain mode because
    AQE's unfinalized plans hide codegen markers in simple mode."""
    text = explain_string(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
