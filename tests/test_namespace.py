"""df.plumba namespace parity (the reference's registered expr namespace,
ref `__init__.py:802-827`, as a DataFrame accessor)."""

from __future__ import annotations

from polars_numba_spark.namespace import attach


def test_plumba_namespace_roundtrip(spark):
    attach()
    attach()  # idempotent
    df = spark.createDataFrame(
        [("a", 1.0, 0), ("a", 2.0, 1), ("b", 5.0, 2)], "k string, v double, ord long"
    )

    def add(acc, v):
        return acc + v

    out = df.plumba.fold("k", add, 0.0, "double", columns=["v"], order_by="ord")
    assert sorted(tuple(r) for r in out.collect()) == [("a", 3.0), ("b", 5.0)]

    assert df.plumba.collect_fold(add, 0.0, column_names=["v"], order_by="ord") == 8.0

    scanned = df.plumba.assoc_scan("sum", "v", order_by="ord")
    assert [r["scan"] for r in scanned.orderBy("ord").collect()] == [1.0, 3.0, 8.0]
