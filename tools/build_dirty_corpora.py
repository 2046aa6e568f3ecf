"""Build the three DIRTY-DATA variants the round-11 robustness sweeps use.

At 100 TB, nulls, degenerate slices and empty partitions are routine; the
driver's synthetic testdata contains none of them (zero nulls in every
column at every SF), so the cross-engine gate never exercises those paths.
Each build here is a single-file-parquet variant of sf0.001 that
tools/check_oracle.py can gate directly:

- ``/tmp/sfnulls``  — deterministic NULL injection: every 7th user_id,
  every 5th value, every 3rd props, every 9th text, every 6th lang.
- ``/tmp/sfmicro``  — degenerate 1-5-row slices per pipeline table
  (single-day series, zero-variance pairs, wedge-free graphs).
- ``/tmp/sfunicode`` — unicode-adversarial documents (Turkish İ, Greek
  final-sigma candidates, CJK/emoji, NBSP). Under the default
  ``casefold='full'`` mode the known JVM-vs-utf8proc case-mapping
  divergers remain (documented caveat); ``PNS_CASEFOLD=simple`` clears
  them (tools/dirty_gate.py runs it that way).
- empty tables are built by tests/test_empty_corpus.py and
  tools/empty_sweep.py (zero-row frames with the real schemas).

Usage:
    python tools/build_dirty_corpora.py
    python tools/check_oracle.py /tmp/sfnulls
    python tools/check_oracle.py /tmp/sfmicro
    PNS_CASEFOLD=simple python tools/check_oracle.py /tmp/sfunicode
"""
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.001"

VERBATIM = ["region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "embeddings"]

MICRO_SLICES = {
    "region": "1=1", "nation": "1=1",
    "customer": "c_custkey < 5", "supplier": "s_suppkey < 3",
    "part": "p_partkey < 5",
    "orders": "o_orderkey < 40",
    "lineitem": "l_orderkey < 40",
    "events": "event_id < 60",
    "documents": "doc_id < 3",
    "embeddings": "vec_id < 5",
}


def build_nulls(dst: str = "/tmp/sfnulls") -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(f"""
      COPY (SELECT event_id, ts,
                   CASE WHEN event_id % 7 = 3 THEN NULL ELSE user_id END
                       AS user_id,
                   event_type,
                   CASE WHEN event_id % 5 = 2 THEN NULL ELSE value END
                       AS value,
                   CASE WHEN event_id % 3 = 1 THEN NULL ELSE props END
                       AS props
            FROM read_parquet('{SRC}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT doc_id,
                   CASE WHEN doc_id % 9 = 4 THEN NULL ELSE text END AS text,
                   CASE WHEN doc_id % 6 = 5 THEN NULL ELSE lang END AS lang,
                   source, n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")


def build_unicode(dst: str = "/tmp/sfunicode") -> None:
    """Unicode-adversarial documents (the round-11 sweep, codified):
    deterministic suffix/infix injection of exactly the character classes
    that stress cross-engine text semantics — Turkish dotted İ, Greek
    final-sigma candidates (UPPERCASE sigma that full mapping lowers
    context-sensitively), pre-lowered final sigma, CJK+emoji, and NBSP
    inside the whitespace run. Every other table is verbatim."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM + ["events"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(f"""
      COPY (SELECT doc_id,
                   CASE doc_id % 6
                     WHEN 0 THEN text || ' İstanbul DİYARBAKIR'
                     WHEN 1 THEN text || ' ΟΔΥΣΣΕΥΣ ΣΟΦΙΑ'
                     WHEN 2 THEN text || ' ήρως τῆς πόλεως'
                     WHEN 3 THEN text || ' 中文测试 😀🚀 café'
                     WHEN 4 THEN replace(text, ' ', chr(160))
                     ELSE text
                   END AS text,
                   lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")


def build_micro(dst: str = "/tmp/sfmicro") -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t, pred in MICRO_SLICES.items():
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')
                  WHERE {pred})
            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")


def build_combined(dst: str = "/tmp/sfcombined") -> None:
    """Combined-adversity corpus (VERDICT r12 #6): nulls + unicode + ×3
    duplicates in ONE build — six single-axis corpora leave damage-class
    INTERACTIONS unexercised (e.g. a NULL text replicated into a 3-copy
    duplicate group, or a unicode-suffixed doc whose replicas co-bucket).
    Damage order: null injection first (the nulls recipe), unicode
    injection second (NULL text stays NULL — `NULL || suffix` is NULL in
    both engines), then the scale_soak id-offset ×3 replication of the
    three pipeline tables (pure SQL here — the offsets are engine-neutral
    arithmetic; NULL ids replicate as NULL). Gate it under
    ``PNS_CASEFOLD=simple`` like the unicode leg."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        if t != "embeddings":
            shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    offset = 10_000_000  # scale_soak.ID_OFFSET
    rep = lambda inner, id_col: " UNION ALL ".join(  # noqa: E731
        f"SELECT * REPLACE (CAST({id_col} + {k * offset} AS BIGINT) "
        f"AS {id_col}) FROM ({inner})"
        for k in range(3)
    )
    events_dirty = f"""
        SELECT event_id, ts,
               CASE WHEN event_id % 7 = 3 THEN NULL ELSE user_id END AS user_id,
               event_type,
               CASE WHEN event_id % 5 = 2 THEN NULL ELSE value END AS value,
               CASE WHEN event_id % 3 = 1 THEN NULL ELSE props END AS props
        FROM read_parquet('{SRC}/events.parquet')"""
    docs_dirty = f"""
        SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN text || ' İstanbul DİYARBAKIR'
                 WHEN 1 THEN text || ' ΟΔΥΣΣΕΥΣ ΣΟΦΙΑ'
                 WHEN 2 THEN text || ' ήρως τῆς πόλεως'
                 WHEN 3 THEN text || ' 中文测试 😀🚀 café'
                 WHEN 4 THEN replace(text, ' ', chr(160))
                 ELSE text
               END AS text,
               lang, source, n_chars
        FROM (SELECT doc_id,
                     CASE WHEN doc_id % 9 = 4 THEN NULL ELSE text END AS text,
                     CASE WHEN doc_id % 6 = 5 THEN NULL ELSE lang END AS lang,
                     source, n_chars
              FROM read_parquet('{SRC}/documents.parquet'))"""
    emb = f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
    con.execute(f"COPY ({rep(events_dirty, 'event_id')}) "
                f"TO '{dst}/events.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({rep(docs_dirty, 'doc_id')}) "
                f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({rep(emb, 'vec_id')}) "
                f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")


if __name__ == "__main__":
    build_nulls()
    build_micro()
    build_unicode()
    build_combined()
    print("built /tmp/sfnulls, /tmp/sfmicro, /tmp/sfunicode "
          "and /tmp/sfcombined")
