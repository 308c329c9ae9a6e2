"""Ingestion-side parsing queries: the reference's HTML-scraping
stage re-expressed as declarative scans (SURVEY.md §2 S3-S6, R2, R3,
R11, F9, F12, X2).

The reference walks BeautifulSoup trees row-by-row
(scrape_tickers.py:241-310) with per-row try/except containment
(:337-345) and source fallbacks (:388-422). Here the raw page is a
*column*: deterministic HTML fragments are synthesized from the
``customer`` fixture inside the query (so Spark and the DuckDB oracle
parse identical inputs), then parsed back with `regexp_extract_all` —
scan-side codegen, no Python in the loop, embarrassingly parallel.
At 100 TB the synthesis select is replaced by a real raw-HTML column;
every parse expression below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import (
    ASCII_LOWER_SQL,
    ASCII_UPPER_SQL,
    ascii_lower,
    ascii_upper,
)
from psx_data_pipeline_spark.operators.diff import snapshot_diff
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.plans.ticker import PREV_SQL, _prev
from psx_data_pipeline_spark.sources.fixtures import load_table

# --- S3/S4/R2/R3: market-watch table parse ----------------------------------
#
# Two page layouts (the reference's main market-watch table vs the
# corporate fallback table have different column orders); the header
# row drives column resolution (scrape_tickers.py:259-271). Rows with
# custkey % 13 = 0 are malformed (a dropped cell — arity filter R2,
# reference :278). Cell values avoid '<' by construction.

_TD = "'<tr><td>' || {0} || '</td><td>' || {1} || '</td><td>' || {2} || '</td></tr>'"

_RAW_ROWS_SQL = """
  SELECT c_custkey,
    CASE WHEN c_custkey % 2 = 0
         THEN '<tr><th>SYMBOL</th><th>NAME</th><th>SEGMENT</th></tr>'
         ELSE '<tr><th>NAME</th><th>SEGMENT</th><th>SYMBOL</th></tr>'
    END AS header,
    CASE
      WHEN c_custkey % 13 = 0 THEN
        '<tr><td>' || c_name || '</td><td>' || c_mktsegment || '</td></tr>'
      WHEN c_custkey % 2 = 0 THEN
        {sym_first}
      ELSE
        {sym_last}
    END AS html
  FROM customer
""".format(
    sym_first=_TD.format("'C' || c_custkey", "c_name", "c_mktsegment"),
    sym_last=_TD.format("c_name", "c_mktsegment", "'C' || c_custkey"),
)

MARKET_WATCH_ORACLE = f"""
WITH raw AS ({_RAW_ROWS_SQL}),
parsed AS (
  SELECT c_custkey,
         regexp_extract_all(header, '<th>([^<]*)</th>', 1) AS hcells,
         regexp_extract_all(html, '<td>([^<]*)</td>', 1) AS cells
  FROM raw
)
SELECT cells[list_position(hcells, 'SYMBOL')] AS symbol,
       cells[list_position(hcells, 'NAME')] AS name,
       cells[list_position(hcells, 'SEGMENT')] AS segment
FROM parsed
WHERE len(cells) = 3
"""


@query("market_watch_parse", MARKET_WATCH_ORACLE)
def q_market_watch_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4: parse an HTML ticker table from a raw-page column with
    header-driven column resolution (R3) and a malformed-row arity
    filter (R2). Reference scrape_tickers.py:241-310."""
    c = load_table(spark, "customer", sf_dir)
    k = F.col("c_custkey")
    cell = lambda e: F.concat(F.lit("<td>"), e, F.lit("</td>"))  # noqa: E731
    row3 = lambda a, b, d: F.concat(  # noqa: E731
        F.lit("<tr>"), cell(a), cell(b), cell(d), F.lit("</tr>")
    )
    sym = F.concat(F.lit("C"), k.cast("string"))
    raw = c.select(
        k,
        F.when(
            k % 2 == 0,
            F.lit("<tr><th>SYMBOL</th><th>NAME</th><th>SEGMENT</th></tr>"),
        )
        .otherwise(F.lit("<tr><th>NAME</th><th>SEGMENT</th><th>SYMBOL</th></tr>"))
        .alias("header"),
        F.when(
            k % 13 == 0,
            F.concat(
                F.lit("<tr>"), cell(F.col("c_name")),
                cell(F.col("c_mktsegment")), F.lit("</tr>"),
            ),
        )
        .when(k % 2 == 0, row3(sym, F.col("c_name"), F.col("c_mktsegment")))
        .otherwise(row3(F.col("c_name"), F.col("c_mktsegment"), sym))
        .alias("html"),
    )
    parsed = raw.select(
        F.expr(r"regexp_extract_all(header, '<th>([^<]*)</th>', 1)").alias("hcells"),
        F.expr(r"regexp_extract_all(html, '<td>([^<]*)</td>', 1)").alias("cells"),
    ).where(F.size("cells") == 3)
    pick = lambda label: F.element_at(  # noqa: E731
        F.col("cells"), F.array_position(F.col("hcells"), label).cast("int")
    )
    return parsed.select(
        pick("SYMBOL").alias("symbol"),
        pick("NAME").alias("name"),
        pick("SEGMENT").alias("segment"),
    )


# --- S5/X2: company-detail enrich -------------------------------------------
#
# Per-ticker detail fetch = left join against a profile table; the
# reference's extraction-heuristic ladder (name: h1/h2/h3 →
# title-split → regex, sector: selector → whitelist → keyword →
# default, scrape_tickers.py:88-203) becomes coalesce chains; a
# simulated fetch failure (custkey % 11 = 0) yields the default row
# with an error marker instead of a task failure (X2, :337-345).

# upper()/lower() are ASCII-only translate() on BOTH sides: the
# engines' full-unicode case maps disagree on multi-char folds
# (Spark 'ß'→'SS' vs DuckDB 'ẞ'; Java's contextual final sigma) —
# found by the generative scrape fuzz; fixture names are ASCII so
# driver results are unchanged (textfns.ascii_upper note).
_DETAILS_SQL = f"""
  SELECT c_custkey AS symbol_id,
         CASE WHEN c_custkey % 6 = 0 THEN {ASCII_UPPER_SQL.format('c_name')} END AS detail_name,
         CASE WHEN c_custkey % 9 = 0 THEN 'TECHNOLOGY' END AS detail_sector,
         {ASCII_LOWER_SQL.format('c_name')} || CASE c_custkey % 7
           WHEN 0 THEN ' express logistics provider'
           WHEN 1 THEN ' ironic media house'
           WHEN 2 THEN ' final settlement bank'
           ELSE ' diversified holdings' END AS description
  FROM customer WHERE c_custkey % 3 = 0
"""

_KEYWORD_SECTOR_SQL = """
  CASE WHEN contains(description, 'express') THEN 'LOGISTICS'
       WHEN contains(description, 'ironic') THEN 'MEDIA'
       WHEN contains(description, 'final') THEN 'BANKING'
  END
"""

COMPANY_ENRICH_ORACLE = f"""
WITH base AS ({PREV_SQL}), det AS ({_DETAILS_SQL})
SELECT b.symbol_id,
  CASE WHEN b.symbol_id % 11 = 0 THEN b.name
       ELSE COALESCE(d.detail_name, b.name, 'Unknown Company') END AS name,
  CASE WHEN b.symbol_id % 11 = 0 THEN 'Unknown'
       ELSE COALESCE(d.detail_sector, {_KEYWORD_SECTOR_SQL},
                     b.sector, 'Unknown') END AS sector,
  (b.symbol_id % 11 = 0) AS fetch_error
FROM base b LEFT JOIN det d USING (symbol_id)
"""


@query("company_enrich", COMPANY_ENRICH_ORACLE)
def q_company_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: detail enrich as a left join + coalesce ladders; X2: failed
    fetches degrade to the default row with ``fetch_error`` set, never
    a task failure (reference scrape_tickers.py:88-203, :337-345)."""
    c = load_table(spark, "customer", sf_dir)
    base = _prev(spark, sf_dir)
    det = c.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("symbol_id"),
        F.when(F.col("c_custkey") % 6 == 0, ascii_upper("c_name")).alias("detail_name"),
        F.when(F.col("c_custkey") % 9 == 0, F.lit("TECHNOLOGY")).alias(
            "detail_sector"
        ),
        F.concat(
            ascii_lower("c_name"),
            F.when(F.col("c_custkey") % 7 == 0, F.lit(" express logistics provider"))
            .when(F.col("c_custkey") % 7 == 1, F.lit(" ironic media house"))
            .when(F.col("c_custkey") % 7 == 2, F.lit(" final settlement bank"))
            .otherwise(F.lit(" diversified holdings")),
        ).alias("description"),
    )
    failed = F.col("symbol_id") % 11 == 0
    kw = (
        F.when(F.col("description").contains("express"), F.lit("LOGISTICS"))
        .when(F.col("description").contains("ironic"), F.lit("MEDIA"))
        .when(F.col("description").contains("final"), F.lit("BANKING"))
    )
    return base.join(det, "symbol_id", "left").select(
        "symbol_id",
        F.when(failed, F.col("name"))
        .otherwise(F.coalesce("detail_name", "name", F.lit("Unknown Company")))
        .alias("name"),
        F.when(failed, F.lit("Unknown"))
        .otherwise(F.coalesce(F.col("detail_sector"), kw, F.col("sector"), F.lit("Unknown")))
        .alias("sector"),
        failed.alias("fetch_error"),
    )


# --- S6: prioritized fallback source ----------------------------------------

FALLBACK_SOURCE_ORACLE = f"""
WITH psx AS (
  SELECT c_custkey AS symbol_id, c_name AS name, 'psx' AS src
  FROM customer WHERE c_custkey % 5 <> 0
),
corporate AS (
  SELECT c_custkey AS symbol_id,
         {ASCII_UPPER_SQL.format('c_name')} AS name, 'corporate' AS src
  FROM customer
)
SELECT * FROM psx
UNION ALL
SELECT c.* FROM corporate c LEFT JOIN psx p USING (symbol_id)
WHERE p.symbol_id IS NULL
"""


@query("fallback_source", FALLBACK_SOURCE_ORACLE)
def q_fallback_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: two readers of the same logical table, priority-merged —
    rows the primary source missed come from the fallback via one
    anti-join (reference scrape_tickers.py:388-422 tries the corporate
    listing only when the market-watch scrape fails)."""
    c = load_table(spark, "customer", sf_dir)
    psx = c.where(F.col("c_custkey") % 5 != 0).select(
        F.col("c_custkey").alias("symbol_id"),
        F.col("c_name").alias("name"),
        F.lit("psx").alias("src"),
    )
    corporate = c.select(
        F.col("c_custkey").alias("symbol_id"),
        # ASCII-only upcase: full upper() is not oracle-exact on
        # multi-char folds ('ß') — see textfns.ascii_upper
        ascii_upper("c_name").alias("name"),
        F.lit("corporate").alias("src"),
    )
    return psx.unionByName(
        corporate.join(psx.select("symbol_id"), "symbol_id", "left_anti")
    )


# --- F9/F10: URL normalization ----------------------------------------------

URL_NORMALIZE_ORACLE = """
WITH hrefs AS (
  SELECT c_custkey, 'C' || c_custkey AS symbol,
    CASE c_custkey % 4
      WHEN 0 THEN '/company/C' || c_custkey
      WHEN 1 THEN 'company/C' || c_custkey
      WHEN 2 THEN 'https://ext.example.com/c/C' || c_custkey
      ELSE NULL
    END AS href
  FROM customer
)
SELECT symbol,
  CASE
    WHEN href IS NULL THEN 'https://dps.psx.com.pk/company/' || symbol
    WHEN starts_with(href, 'http') THEN href
    WHEN starts_with(href, '/') THEN 'https://dps.psx.com.pk' || href
    ELSE 'https://dps.psx.com.pk/' || href
  END AS url
FROM hrefs
"""


@query("url_normalize", URL_NORMALIZE_ORACLE)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: relative→absolute href normalization (reference
    scrape_tickers.py:296-301) with the F10 template fallback for
    missing hrefs (config.py URL template)."""
    base = "https://dps.psx.com.pk"
    c = load_table(spark, "customer", sf_dir)
    k = F.col("c_custkey")
    sym = F.concat(F.lit("C"), k.cast("string"))
    href = (
        F.when(k % 4 == 0, F.concat(F.lit("/company/"), sym))
        .when(k % 4 == 1, F.concat(F.lit("company/"), sym))
        .when(k % 4 == 2, F.concat(F.lit("https://ext.example.com/c/"), sym))
    )
    hrefs = c.select(sym.alias("symbol"), href.alias("href"))
    h = F.col("href")
    return hrefs.select(
        "symbol",
        F.when(h.isNull(), F.concat(F.lit(base + "/company/"), F.col("symbol")))
        .when(h.startswith("http"), h)
        .when(h.startswith("/"), F.concat(F.lit(base), h))
        .otherwise(F.concat(F.lit(base + "/"), h))
        .alias("url"),
    )


# --- F12: date formatting / parsing roundtrip -------------------------------

DATE_ROUNDTRIP_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y%m%d') AS ymd,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS stamp,
       CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE)
         AS reparsed
FROM orders
"""


@query("date_roundtrip", DATE_ROUNDTRIP_ORACLE)
def q_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: the reference's strftime/strptime pairs
    (update_ticker_info.py:225, scrape_tickers.py:526, utils.py:131-136)
    as `date_format`/`to_date` — pattern-based, scan-side."""
    o = load_table(spark, "orders", sf_dir)
    ymd = F.date_format("o_orderdate", "yyyyMMdd")
    return o.select(
        "o_orderkey",
        ymd.alias("ymd"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("stamp"),
        F.to_date(ymd, "yyyyMMdd").alias("reparsed"),
    )


# --- R11: first-run bootstrap -----------------------------------------------

FIRST_RUN_ORACLE = f"""
WITH prev AS ({PREV_SQL})
SELECT 'ADDED' AS change_type, symbol_id FROM prev
"""


@query("first_run_bootstrap", FIRST_RUN_ORACLE)
def q_first_run_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: the first run diffs against an *empty frame of the same
    schema*, not a code branch that skips the change table (reference
    scrape_tickers.py:650-654 logs "first run" and writes nothing —
    SURVEY.md §7.4 re-specs it so the change log is total)."""
    cur = _prev(spark, sf_dir)
    empty_prev = cur.where(F.lit(False))
    return snapshot_diff(cur, empty_prev, "symbol_id")
