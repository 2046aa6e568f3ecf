"""Plan-string extraction and structural predicates over Spark plans.

Mode notes (load-bearing): *formatted* mode prints each node twice (tree
line + detail section) and separates operator arguments from the node name
(``Exchange (4)`` … ``Arguments: hashpartitioning(...)``), so structural
counting is done on *simple* mode, where a node prints once as
``Exchange hashpartitioning(...)``. Scan attributes (PushedFilters /
ReadSchema) only appear in formatted mode.
"""

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
    excluded — those are the cheap kind). Counted in simple mode, where each
    Exchange prints exactly once with its partitioning inline."""
    text = explain_string(df, "simple")
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    text = explain_string(df, "simple")
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: at least a partial+final aggregate pair.
    Simple mode prints each aggregate node once, so >= 2 means a real pair
    (formatted mode would double-count a single node)."""
    text = explain_string(df, "simple")
    return (
        len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", text)) >= 2
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider/more is better — more of
    the plan runs as generated JVM code). Uses codegen explain mode because
    AQE's unfinalized plans hide codegen markers in simple mode."""
    text = explain_string(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
