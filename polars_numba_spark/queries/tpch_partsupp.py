"""TPC-H Q2/Q11/Q16/Q20 shapes over a DERIVED partsupp relation.

The driver's testdata ships no ``partsupp`` table (r4 verdict, missing #4),
so the four TPC-H queries that need it were absent. This module closes the
gap by deriving a deterministic partsupp from the tables that DO exist:
each part gets 4 suppliers via pure integer arithmetic on ``p_partkey`` and
the supplier count, and availqty/supplycost are integer hashes of the
(partkey, suppkey) pair. Both engines rebuild the relation independently
from the same formulas — the Spark side as a lazy plan (no eager counts:
the supplier cardinality arrives via a broadcast 1-row aggregate), the
DuckDB oracle as a CTE — so the correctness gate checks the full query
shapes, not a shared materialization.

Money stays in integer cents (``ps_supplycost_cents``) through every
aggregate and comparison; doubles appear only as a final display division
of identical integers, so cross-engine value hashes are exact by
construction.

Scale posture: partsupp is |part| x 4 rows built from a broadcast of the
4-row multiplier and the 1-row supplier count — no shuffle to construct.
Q2/Q11/Q16/Q20 then follow the standard TPC-H plan shapes: dimension sides
(supplier/nation/region, the NOT-IN exclusion set, the qualified-supplier
set) are broadcast; the only shuffles are the keyed aggregations.

Reference parity: the reference engine runs the TPC-H suite through its
host engine (SURVEY.md §2.B); these four complete the 22 query shapes
(18 were already present) with documented column adaptations — the
testdata's part/supplier tables lack p_mfgr/p_container/s_address/
s_comment, so Q2 returns the surviving columns and Q16's "customer
complaints" exclusion becomes the negative-account-balance suppliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_numba_spark.queries.catalog import _t, register

# Shared DuckDB CTE body: the derived partsupp relation. The inner DISTINCT
# guards the (p_partkey + k*13) % n_supp spread against tiny supplier
# tables where two k-offsets could alias to the same supplier.
_PARTSUPP_CTE = """
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 31 + ps_suppkey * 7) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 17 + ps_suppkey * 3) % 20000 + 100 AS ps_supplycost_cents
    FROM (
        SELECT DISTINCT p_partkey AS ps_partkey,
               (p_partkey + k * 13) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
        FROM part, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    )
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same relation as ``_PARTSUPP_CTE``, as a lazy Spark plan.

    |part| x 4 rows; the 4-row multiplier and the 1-row supplier count are
    broadcast, so construction adds no shuffle to the consuming query.
    """
    p = _t(spark, sf_dir, "part").select("p_partkey")
    n_supp = _t(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    ks = spark.range(4).select(F.col("id").alias("k"))
    pairs = (
        p.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n_supp))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.pmod(F.col("p_partkey") + F.col("k") * 13, F.col("n_supp"))
            .cast("long")
            .alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (
            F.pmod(
                F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7, F.lit(9999)
            )
            + 1
        )
        .cast("long")
        .alias("ps_availqty"),
        (
            F.pmod(
                F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 3,
                F.lit(20000),
            )
            + 100
        )
        .cast("long")
        .alias("ps_supplycost_cents"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    region_supp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
               ps.ps_partkey, ps.ps_supplycost_cents
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    min_cost AS (
        SELECT ps_partkey, MIN(ps_supplycost_cents) AS min_cents
        FROM region_supp GROUP BY ps_partkey
    )
    SELECT rs.s_acctbal, rs.s_name, rs.n_name, p.p_partkey, p.p_name,
           CAST(rs.ps_supplycost_cents AS DOUBLE) / 100.0 AS supply_cost
    FROM region_supp rs
    JOIN min_cost m
      ON rs.ps_partkey = m.ps_partkey
     AND rs.ps_supplycost_cents = m.min_cents
    JOIN part p ON rs.ps_partkey = p.p_partkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for every EUROPE-sourced part of
    a given size/type, the supplier(s) offering the regional minimum
    supply cost — the classic correlated-MIN subquery, decorrelated into
    a per-part MIN aggregate joined back on (part, cost).

    Adaptation (documented, testdata lacks the columns): no
    p_mfgr/s_address/s_phone/s_comment in the output; p_type has no
    '%BRASS' suffixes so the filter is equality on 'ECONOMY'.

    Plan shape: supplier/nation/region fold into one broadcast dimension;
    partsupp is the fact side; the MIN aggregate shuffles on ps_partkey
    once and joins back. At 100 TB the region filter prunes the dimension
    before broadcast and AQE handles the (rare) skewed part.
    """
    ps = derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    dim = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    region_supp = ps.join(
        F.broadcast(dim), ps.ps_suppkey == F.col("s_suppkey")
    ).select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    min_cost = region_supp.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    return (
        region_supp.join(
            min_cost,
            (region_supp.ps_partkey == min_cost.ps_partkey)
            & (region_supp.ps_supplycost_cents == min_cost.min_cents),
        )
        .drop(min_cost.ps_partkey)
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias(
                "supply_cost"
            ),
        )
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    nation_ps AS (
        SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS val_cents
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(SUM(val_cents) AS BIGINT) AS stock_value_cents
    FROM nation_ps
    GROUP BY ps_partkey
    HAVING SUM(val_cents) > (SELECT SUM(val_cents) / 400.0 FROM nation_ps)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part stock value
    within one nation, kept only where it exceeds a fixed fraction of the
    nation's total — the scalar-subquery HAVING, decorrelated into a
    1-row global aggregate cross-joined (broadcast) against the grouped
    values. All arithmetic is int64 cents; the only double is the
    threshold division, computed from the same exact integer total in
    both engines.

    Plan shape: one shuffle for the per-part aggregate; the global total
    reuses the per-part aggregate (sum of sums) rather than re-scanning;
    the 1-row threshold is broadcast. Linear at any scale.
    """
    ps = derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nation_ps = ps.join(
        F.broadcast(
            s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey")).select(
                "s_suppkey"
            )
        ),
        ps.ps_suppkey == F.col("s_suppkey"),
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("val_cents"),
    )
    per_part = nation_ps.groupBy("ps_partkey").agg(
        F.sum("val_cents").alias("stock_value_cents")
    )
    threshold = per_part.agg(
        (F.sum("stock_value_cents") / F.lit(400.0)).alias("thr")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("stock_value_cents") > F.col("thr"))
        .select("ps_partkey", "stock_value_cents")
    )


@register(
    "q16_part_supplier_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 22, 25, 28)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier counts
    per (brand, type, size) bucket, excluding one brand, one type, and a
    NOT-IN supplier set. Adaptation: the spec's "customer complaints"
    comment-scan becomes the negative-account-balance suppliers (the
    testdata has no s_comment).

    The NOT IN is a broadcast left-anti join (s_suppkey is non-null by
    construction, so anti-join and NOT IN agree); the distinct count is
    the one shuffle. Linear at any scale.
    """
    ps = derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 22, 25, 28))
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    year_qty AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    qualified AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
        JOIN year_qty yq
          ON yq.l_partkey = ps_partkey AND yq.l_suppkey = ps_suppkey
        WHERE ps_availqty > 0.5 * yq.qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN qualified ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): ASIA suppliers whose stock of
    'red%' parts exceeds half of what they shipped in 1997 — the doubly
    nested IN subquery, decorrelated into a per-(part, supplier) shipped
    quantity aggregate inner-joined against partsupp (the spec's
    correlated ``>`` is false when no lineitems exist, which an inner
    join reproduces exactly).

    Plan shape: the lineitem aggregate is the one big shuffle (with its
    shipdate filter pushed to the scan); partsupp joins it on the same
    (partkey, suppkey) pair; part/supplier/nation/region are broadcast.
    """
    ps = derived_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    year_qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    qualified = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
        .join(
            year_qty,
            (ps.ps_partkey == year_qty.l_partkey)
            & (ps.ps_suppkey == year_qty.l_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return qualified.join(
        F.broadcast(dim), qualified.ps_suppkey == F.col("s_suppkey")
    ).select("s_name", "n_name")
