"""Property pins for blocked fuzzy record linkage (plans/linkage.py):
the corruption feed really is one deletion, blocking recovers the
true master for every in-contract name, and the best-match window is
deterministic under ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.linkage import dirty_names
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_dirty_feed_is_single_deletion(spark):
    joined = (
        dirty_names(spark, SF)
        .join(load_table(spark, "part", SF), "p_partkey")
        .select("p_partkey", "dname", "p_name")
    )
    rows = joined.collect()
    assert rows, "empty corruption feed"
    for r in rows:
        assert len(r["dname"]) == len(r["p_name"]) - 1, r
        # a single deletion: dname is p_name with exactly one char out
        name, d = r["p_name"], r["dname"]
        assert any(
            name[:i] + name[i + 1:] == d for i in range(len(name))
        ), r


def test_every_in_contract_row_links_to_its_master(spark):
    out = QUERIES["fuzzy_name_linkage"](spark, SF)
    parts = (
        load_table(spark, "part", SF)
        .where(
            F.col("p_name").isNotNull()
            & (F.length("p_name") >= 5)
            & (F.length("p_name") == F.octet_length("p_name"))
        )
    )
    n_in = parts.count()
    rows = out.collect()
    # blocking recall is exact for single-deletion corruption >= 5
    # chars: every in-contract part row gets a match at distance <= 2
    assert len(rows) == n_in
    assert all(r["lev_dist"] <= 2 for r in rows)
    # and the match is unique per dirty row
    assert len({r["p_partkey"] for r in rows}) == len(rows)


def test_match_is_true_master_unless_closer_name_exists(spark):
    out = QUERIES["fuzzy_name_linkage"](spark, SF).alias("o")
    truth = load_table(spark, "part", SF).select("p_partkey", "p_name")
    j = out.join(truth, "p_partkey").collect()
    wrong = [r for r in j if r["master_name"] != r["p_name"]]
    # a deletion always leaves the true master at distance 1, so a
    # different winner must be at distance <= 1 too (0 or a tie at 1
    # broken lexicographically)
    for r in wrong:
        assert r["lev_dist"] <= 1, r
