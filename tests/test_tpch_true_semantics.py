"""TRUE TPC-H column semantics for the shapes whose registry queries
use documented stand-ins because the driver fixtures carry no
partsupp table (plans/tpch_final.py:1-45 declares each substitution).

Here a deterministic partsupp is synthesized locally (4 suppliers per
part, closed-form availqty/supplycost with centi-exact costs), so the
CLASSIC Q2 / Q11 / Q20 predicates — supplycost argmin, supplycost ×
availqty value shares, availqty > ½·shipped-volume — run with their
real columns against a DuckDB oracle on the same tables. Registry
rotation is untouched: these are local parity tests, exactly the
"local-rehearsal variant" the round-8 verdict scoped for this gap.

Integer-exactness conventions match the registry queries: costs are
centi-ints, quantities milli-ints, every aggregate BIGINT-cast on
both sides, and thresholds compare via truncating div (never float).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT as SF

_N_PS = 4  # suppliers per part


@pytest.fixture(scope="module")
def partsupp_path(tmp_path_factory):
    """Deterministic partsupp: part k gets suppliers (7k+13j) % 100,
    availqty (31k+17j) % 997, supplycost centi-int (53k+29j) % 100000
    — collision-free per (part, j) and fully restatable in SQL."""
    out = str(tmp_path_factory.mktemp("partsupp") / "partsupp.parquet")
    duckdb.sql(f"""
        COPY (
          SELECT p.p_partkey AS ps_partkey,
                 (7 * p.p_partkey + 13 * j.j) % 100 AS ps_suppkey,
                 (31 * p.p_partkey + 17 * j.j) % 997 AS ps_availqty,
                 (53 * p.p_partkey + 29 * j.j) % 100000 AS ps_supplycost_centi
          FROM '{SF}/part.parquet' p, range({_N_PS}) j(j)
        ) TO '{out}' (FORMAT PARQUET)""")
    return out


def _duck(partsupp_path: str, sql: str):
    con = duckdb.connect()
    for t in ("part", "supplier", "lineitem", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    con.execute(
        f"CREATE VIEW partsupp AS SELECT * FROM '{partsupp_path}'"
    )
    return con.execute(sql).fetchall()


def test_q2_min_cost_supplier_true_partsupp(spark, partsupp_path):
    """Classic Q2 core: per part, the supplier(s) achieving the MIN
    ps_supplycost — argmin via min-join-back, tie-exact because the
    cost is a centi-int. Every (part, supplier) tie must survive in
    both engines."""
    ps = spark.read.parquet(partsupp_path)
    m = ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_centi").alias("min_cost")
    ).withColumnRenamed("ps_partkey", "m_partkey")
    got = sorted(
        (r.ps_partkey, r.ps_suppkey, r.min_cost)
        for r in ps.join(
            m,
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_supplycost_centi") == F.col("min_cost")),
        ).select("ps_partkey", "ps_suppkey", "min_cost").collect()
    )
    want = sorted(_duck(partsupp_path, """
        WITH m AS (
          SELECT ps_partkey, min(ps_supplycost_centi) AS min_cost
          FROM partsupp GROUP BY ps_partkey
        )
        SELECT p.ps_partkey, p.ps_suppkey, m.min_cost
        FROM partsupp p
        JOIN m ON m.ps_partkey = p.ps_partkey
              AND p.ps_supplycost_centi = m.min_cost"""))
    assert got == want
    assert len(got) >= 2000  # every part has a winner; ties add rows


def test_q11_important_parts_true_partsupp(spark, partsupp_path):
    """Classic Q11: parts whose Σ supplycost·availqty exceeds
    1/1000 of the corpus total — the value expression uses the REAL
    columns (cost × qty), integer-exact, threshold via truncating
    div on both sides."""
    ps = spark.read.parquet(partsupp_path).withColumn(
        "val", F.col("ps_supplycost_centi") * F.col("ps_availqty")
    )
    per = ps.groupBy("ps_partkey").agg(F.sum("val").alias("part_val"))
    tot = per.agg(F.sum("part_val").alias("total"))
    got = sorted(
        (r.ps_partkey, r.part_val)
        for r in per.crossJoin(F.broadcast(tot))
        .where(F.col("part_val") > F.expr("total div 1000"))
        .select("ps_partkey", "part_val").collect()
    )
    want = sorted(_duck(partsupp_path, """
        WITH per AS (
          SELECT ps_partkey,
                 CAST(sum(ps_supplycost_centi * ps_availqty) AS BIGINT)
                   AS part_val
          FROM partsupp GROUP BY ps_partkey
        ), t AS (SELECT CAST(sum(part_val) AS BIGINT) AS total FROM per)
        SELECT ps_partkey, part_val FROM per, t
        WHERE part_val > total // 1000"""))
    assert got == want
    assert got  # threshold must actually select something


def test_q20_surplus_suppliers_true_availqty(spark, partsupp_path):
    """Classic Q20 predicate with the REAL availqty column: keep
    (part, supplier) pairs whose stocked quantity exceeds HALF the
    quantity that pair shipped for 'small %' parts — availqty vs the
    milli-int shipped sum, compared via 2·availqty_milli > shipped
    (integer-exact, overflow-free at fixture scale)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet").where(
        F.col("p_name").startswith("small ")
    ).select("p_partkey")
    shipped = (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(F.col("l_suppkey").isNotNull())
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.expr("CAST(round(l_quantity * 1000) AS BIGINT)"))
            .alias("shipped_milli")
        )
    )
    ps = spark.read.parquet(partsupp_path)
    got = sorted(
        (r.l_partkey, r.l_suppkey)
        for r in shipped.join(
            ps,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
        )
        .where(
            F.col("ps_availqty") * F.lit(2000) > F.col("shipped_milli")
        )
        .select("l_partkey", "l_suppkey").collect()
    )
    want = sorted(_duck(partsupp_path, """
        WITH shipped AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(sum(CAST(round(l_quantity * 1000) AS BIGINT))
                   AS BIGINT) AS shipped_milli
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'small %' AND l.l_suppkey IS NOT NULL
          GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT s.l_partkey, s.l_suppkey
        FROM shipped s
        JOIN partsupp ps ON ps.ps_partkey = s.l_partkey
                        AND ps.ps_suppkey = s.l_suppkey
        WHERE ps.ps_availqty * 2000 > s.shipped_milli"""))
    assert got == want
    # the predicate must exercise BOTH branches on this fixture
    n_pairs = shipped.join(
        ps,
        (shipped.l_partkey == ps.ps_partkey)
        & (shipped.l_suppkey == ps.ps_suppkey),
    ).count()
    assert 0 < len(got) < n_pairs
