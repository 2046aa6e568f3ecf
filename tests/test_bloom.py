"""Bloom runtime-filter contract: no false negatives ever, bounded false
positives, data-scaled sizing, and safe degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_numba_spark.operators.sketch import bloom_build, bloom_probe


def _build_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_no_false_negatives_and_bounded_false_positives(spark):
    members = list(range(0, 400, 2))  # 200 even keys
    build = _build_df(spark, members)
    bloom = bloom_build(build, "k", bits_per_key=8, n_hashes=4)
    probe = _build_df(spark, list(range(400)))  # members + 200 odd non-members
    out = bloom_probe(probe, "k", bloom).collect()
    verdicts = {r["k"]: r["passes_bloom"] for r in out}
    # the defining guarantee: every true member passes
    assert all(verdicts[k] for k in members)
    # non-members pass only at the bounded FP rate ((1-e^-0.5)^4 ~ 2.4%;
    # allow 5x headroom on 200 trials before calling the filter broken)
    fp = sum(1 for k in range(1, 400, 2) if verdicts[k])
    assert fp <= 25, f"false-positive rate {fp}/200 is not a working bloom"


def test_bitmap_is_data_scaled_and_bits_match_membership(spark):
    small = bloom_build(_build_df(spark, range(10)), "k").collect()[0]
    large = bloom_build(_build_df(spark, range(1000)), "k").collect()[0]
    assert small["m_bits"] == 32 * ((8 * 10 + 31) // 32)
    assert large["m_bits"] == 32 * ((8 * 1000 + 31) // 32)
    assert len(small["words"]) * 32 == small["m_bits"]
    assert len(large["words"]) * 32 == large["m_bits"]
    # every word fits 32 bits (the no-sign-overflow packing contract)
    assert all(0 <= w < (1 << 32) for w in large["words"])


def test_empty_build_rejects_everything(spark):
    build = _build_df(spark, []).where(F.lit(False))
    bloom = bloom_build(build, "k")
    row = bloom.collect()
    assert len(row) == 1 and row[0]["m_bits"] == 32
    assert row[0]["words"] == [0]
    out = bloom_probe(_build_df(spark, range(5)), "k", bloom).collect()
    assert len(out) == 5 and not any(r["passes_bloom"] for r in out)


def test_null_probe_key_gets_null_flag(spark):
    bloom = bloom_build(_build_df(spark, range(8)), "k")
    probe = spark.createDataFrame([(None,), (3,)], "k long")
    out = {r["k"]: r["passes_bloom"] for r in bloom_probe(probe, "k", bloom).collect()}
    assert out[None] is None
    assert out[3] is True


def test_duplicate_and_null_build_keys_are_collapsed(spark):
    dup = spark.createDataFrame([(1,), (1,), (None,), (2,)], "k long")
    row = bloom_build(dup, "k", bits_per_key=8).collect()[0]
    # 2 distinct non-null keys -> m scaled for n=2, not 4
    assert row["m_bits"] == 32


def test_probe_frame_may_own_columns_named_words_or_m_bits(spark):
    """The bitmap's columns are renamed to reserved __bloom_* names before
    the broadcast crossJoin, so a probe frame that itself carries a
    ``words`` or ``m_bits`` column neither collides (ambiguous reference)
    nor loses that column to the trailing drop."""
    bloom = bloom_build(_build_df(spark, range(8)), "k")
    probe = spark.createDataFrame(
        [(3, 111, 222), (9999, 333, 444)], "k long, words long, m_bits long"
    )
    out = {r["k"]: r for r in bloom_probe(probe, "k", bloom).collect()}
    assert out[3]["passes_bloom"] is True
    # the probe frame's own columns survive untouched
    assert out[3]["words"] == 111 and out[3]["m_bits"] == 222
    assert out[9999]["words"] == 333 and out[9999]["m_bits"] == 444
