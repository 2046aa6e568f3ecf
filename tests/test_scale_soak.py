"""The scale/skew soak harness (tools/scale_soak.py) must run end to end:
variant building, timing, ratio reporting. The committed SCALE.md numbers
come from the full sf0.1 x10 run; this test pins the machinery at sf0.001
x2 so it cannot rot."""

from __future__ import annotations

import os
import sys

import pytest

# Heavy tier (VERDICT r14 #2): builds 2x/skew corpus variants and times
# queries against them — minutes of work that belongs in the soak tier,
# not the driver's default gate.
pytestmark = pytest.mark.soak

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scale_soak  # noqa: E402

SRC = "/root/testdata/sf0.001"


def test_soak_harness_end_to_end(spark, tmp_path):
    big = str(tmp_path / "x2")
    skew = str(tmp_path / "skew")
    scale_soak.build_replicated(spark, SRC, big, factor=2)
    scale_soak.build_skewed(spark, SRC, skew)

    # replicas are visible: documents doubled, each text now duplicated
    from polars_numba_spark.sources import load_table

    base_docs = load_table(spark, "documents", SRC).count()
    big_docs = load_table(spark, "documents", big).count()
    assert big_docs == 2 * base_docs

    # skew variant: one hot user holds ~40% of events
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", skew)
    hot = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    assert hot["user_id"] == 42
    assert hot["count"] > 0.3 * ev.count()

    results = scale_soak.run_soak(
        spark, SRC, big, factor=2, queries=["dedup_exact_digests"]
    )
    r = results["dedup_exact_digests"]
    assert r["ratio"] is not None and r["sec_2x"] > 0
    # exact dedup groups by content digest: replicas collapse into the
    # same digest groups, so the group count must NOT grow
    assert r["rows_2x"] == r["rows_1x"]

    skew_results = scale_soak.run_skew(spark, SRC, skew)
    assert skew_results["kernel_fold_event_cents"]["skew_sec"] > 0
    assert skew_results["duplicated_shingle_fraction"]["auto_choice_on_skew"] in (
        "window",
        "join",
    )

    md_path = tmp_path / "SCALE.md"
    scale_soak.write_scale_md(
        results, skew_results, factor=2, sf_dir=SRC, path=str(md_path)
    )
    text = md_path.read_text()
    assert "dedup_exact_digests" in text
    assert "kernel_fold_event_cents" in text
    assert "x2" in text or "2x" in text


def test_semdedup_soak_scales_k_with_corpus(spark, tmp_path):
    """The SemDeDup soak must run the production recipe — k grows with the
    replication factor so cluster size stays bounded."""
    big = str(tmp_path / "x2")
    scale_soak.build_replicated(spark, SRC, big, factor=2)
    out = scale_soak.run_semdedup_soak(spark, SRC, big, factor=2)
    r = out["semantic_dedup_pairs_operator"]
    assert r["k_2x"] == 2 * r["k_1x"]
    assert r["sec_2x"] > 0 and r["ratio"] is not None
