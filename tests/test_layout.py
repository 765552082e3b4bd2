"""Z-order layout audit (B127, ``operators/layout.py``).

Driver-grade DuckDB parity, a Morton-code golden check against an
independent Python bit-interleave, the data-skipping property the
operator exists to demonstrate (balanced two-dimension spans under
z-order vs one-dimension-only under linear), file balance, and
determinism.
"""

import os
import statistics
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.operators.layout import (
    N_FILES,
    ZBITS,
    ZORDER_LAYOUT_ORACLE,
    ZVALUE_SQL,
    q_zorder_layout,
)

from .oracle_utils import compare, duckdb_con


def test_zorder_layout_oracle_parity(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        compare(q_zorder_layout(spark, sf_dir), con, ZORDER_LAYOUT_ORACLE)
    finally:
        con.close()


def test_morton_code_matches_independent_interleave():
    # evaluate the shared ZVALUE_SQL in DuckDB against a plain-Python
    # bit interleave over every (b1, b2) corner and a lattice
    def interleave(b1: int, b2: int) -> int:
        z = 0
        for k in range(ZBITS):
            z |= ((b1 >> k) & 1) << (2 * k + 1)
            z |= ((b2 >> k) & 1) << (2 * k)
        return z

    top = (1 << ZBITS) - 1
    pairs = [(a, b) for a in (0, 1, 85, 170, top) for b in (0, 1, 85, 170, top)]
    pairs += [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (b1 BIGINT, b2 BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    got = con.execute(f"SELECT b1, b2, {ZVALUE_SQL} FROM t").fetchall()
    for b1, b2, z in got:
        assert z == interleave(b1, b2), (b1, b2, z)
    # Morton order is a bijection on the cell grid
    assert len({interleave(a, b) for a in range(16) for b in range(16)}) == 256


def test_zorder_skipping_property(spark, sf_dir):
    rows = q_zorder_layout(spark, sf_dir).collect()
    by = {lay: [r for r in rows if r["layout"] == lay]
          for lay in ("linear", "zorder")}
    for lay, rs in by.items():
        assert len(rs) == N_FILES, lay
    lin_p = statistics.mean(r["span_partkey"] for r in by["linear"])
    lin_s = statistics.mean(r["span_suppkey"] for r in by["linear"])
    z_p = statistics.mean(r["span_partkey"] for r in by["zorder"])
    z_s = statistics.mean(r["span_suppkey"] for r in by["zorder"])
    # linear: perfect on the sorted dim, useless on the other
    assert lin_p < 0.05 and lin_s > 0.9
    # z-order: balanced two-digit-percent spans on BOTH dims
    assert z_p < 0.35 and z_s < 0.35
    # and it beats linear on the unsorted dim by a wide margin
    assert z_s < lin_s / 3


def test_zorder_file_balance_and_partition(spark, sf_dir):
    rows = q_zorder_layout(spark, sf_dir).collect()
    from data_ingestion_api_system_loop_ai_spark.sources.loader import (
        load_table,
    )

    n = load_table(spark, sf_dir, "lineitem").count()
    for lay in ("linear", "zorder"):
        rs = [r for r in rows if r["layout"] == lay]
        assert sum(r["n_rows"] for r in rs) == n
        # equal-count assignment: every file within one row of n/F
        sizes = [r["n_rows"] for r in rs]
        assert max(sizes) - min(sizes) <= 1


def test_zorder_layout_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_zorder_layout(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_zorder_layout(spark, sf_dir).collect()))
    assert a == b
