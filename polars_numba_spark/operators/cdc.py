"""Change-data-capture operators: last-write-wins snapshots, merge/upsert,
and SCD2 (slowly-changing-dimension type 2) history.

A 100-TB training-data pipeline continuously re-ingests mutable upstream
tables (user profiles, document revisions, label corrections) as append-only
changelogs; turning a changelog into "the current state" (snapshot) or "state
with validity intervals" (SCD2) is the standard lakehouse MERGE INTO /
snapshot-compaction step. Without a table format doing it for us, both are
one well-shaped window computation:

- **snapshot**: rank versions per key by the sequence column, keep rank 1,
  drop keys whose winning version is a delete. One hash-partition shuffle on
  the keys; no join. At scale the changelog is typically date-partitioned,
  so the scan prunes to the compaction horizon before the shuffle.
- **SCD2**: each version's validity interval is [its seq, the NEXT version's
  seq) — a ``lead()`` over the same per-key ordering, again a single
  shuffle, and the open interval marks the current row.

Determinism contract: the caller supplies ``tiebreak`` columns that make the
per-key ordering total (a changelog with duplicate (key, seq, tiebreak)
rows has no well-defined winner in ANY engine). Both operators are plain
JVM window functions — no Python in the hot path — and both reproduce
verbatim in ANSI SQL, so every catalog entry carries an exact DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_numba_spark.operators._prep import as_list


def _desc_order(seq_col: str, tiebreak: Sequence[str]) -> list[Column]:
    return [F.col(seq_col).desc_nulls_last()] + [
        F.col(c).desc_nulls_last() for c in tiebreak
    ]


def latest_snapshot(
    changelog: DataFrame,
    keys: str | Sequence[str],
    seq_col: str,
    tiebreak: str | Sequence[str] = (),
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Last-write-wins current state of a changelog: for each key, the row
    with the highest ``(seq_col, *tiebreak)``; keys whose winning row is a
    delete (``op_col`` ∈ ``delete_ops``) disappear from the snapshot.

    NULL sequence values sort last (oldest) — the merge_upsert convention
    for base-snapshot rows that predate every change.
    """
    key_list = as_list(keys)
    w = Window.partitionBy(*key_list).orderBy(
        *_desc_order(seq_col, as_list(tiebreak))
    )
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        # NULL op means "not a delete" (e.g. merge_upsert base rows) — the
        # bare ~isin() would be NULL under three-valued logic and silently
        # drop every op-less row.
        latest = latest.where(
            F.col(op_col).isNull() | ~F.col(op_col).isin(list(delete_ops))
        )
    return latest


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    seq_col: str,
    tiebreak: str | Sequence[str] = (),
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """MERGE INTO without a table format: apply a changelog to a base
    snapshot, producing the post-merge snapshot.

    ``base`` rows are treated as version NULL of their key (they lose to
    any change — NULLs sort oldest); missing columns on either side are
    filled with NULLs by-name. Inserts (change keys absent from base),
    updates (highest-seq change wins), and deletes (winning change is a
    delete op) all fall out of one window pass — no join, one shuffle on
    the merge keys.
    """
    aligned_base = base
    if op_col is not None and op_col not in base.columns:
        aligned_base = aligned_base.withColumn(op_col, F.lit(None).cast("string"))
    if seq_col not in aligned_base.columns:
        schema = {f.name: f.dataType for f in changes.schema.fields}
        aligned_base = aligned_base.withColumn(
            seq_col, F.lit(None).cast(schema[seq_col])
        )
    merged = aligned_base.unionByName(changes, allowMissingColumns=True)
    return latest_snapshot(
        merged, keys, seq_col, tiebreak, op_col=op_col, delete_ops=delete_ops
    )


def scd2_history(
    changelog: DataFrame,
    keys: str | Sequence[str],
    seq_col: str,
    tiebreak: str | Sequence[str] = (),
) -> DataFrame:
    """SCD2 validity intervals: every version of every key annotated with
    ``valid_from`` (its own seq), ``valid_to`` (the next version's seq,
    NULL while current) and ``is_current``. One ``lead()`` window over the
    per-key ordering — the changelog's own columns pass through untouched.
    """
    key_list = as_list(keys)
    order = [F.col(seq_col).asc()] + [
        F.col(c).asc() for c in as_list(tiebreak)
    ]
    w = Window.partitionBy(*key_list).orderBy(*order)
    nxt = F.lead(F.col(seq_col)).over(w)
    return (
        changelog.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint: Column | str,
) -> DataFrame:
    """Snapshot diff: classify every key across two corpus versions as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing a
    content fingerprint (pass ``F.md5("text")`` for documents) — the
    audit a dataset release ships with, and the input to an incremental
    pipeline that only reprocesses ``added``+``changed``.

    One full-outer equi-join on the key; fingerprints are computed
    scan-side on each branch so the join carries (key, digest) pairs, not
    payloads. Returns (key, status)."""
    fp = F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint
    o = old.select(F.col(key).alias("__k"), fp.alias("__fp_old"))
    n = new.select(F.col(key).alias("__k2"), fp.alias("__fp_new"))
    joined = o.join(n, o.__k == n.__k2, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), "added")
        .when(F.col("__fp_new").isNull(), "removed")
        .when(F.col("__fp_old") == F.col("__fp_new"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.coalesce(F.col("__k"), F.col("__k2")).alias(key),
        status.alias("status"),
    )
