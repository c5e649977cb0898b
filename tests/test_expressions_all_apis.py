"""testAllApis-style dual-API expression tests (SURVEY §5 layer:
ExpressionTestBase — flink-table expressions/ScalarFunctionsTest.scala).

Every scalar function from the Flink-1.3 §2.9 surface is evaluated twice —
once as a Table-API Column expression, once as a SQL string through
TableEnvironment.sql() — and both results must equal the expected literal.
Like the reference, the whole suite is driven off ONE fixture row and runs
as exactly two Spark actions (one per API).
"""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.functions import scalar
from flink_1_3_2_hopsworks_spark.table import TableEnvironment

# (name, table_api_column, sql_expression, expected) — built lazily: Column
# construction needs an active SparkSession (PySpark classic mode).
def _cases():
    return [
        # -- string functions ------------------------------------------------
        ("char_length", scalar.char_length("s"), "CHAR_LENGTH(s)", 5),
        ("upper", F.upper("s"), "UPPER(s)", "HELLO"),
        ("lower", F.lower("s"), "LOWER(s)", "hello"),
        ("init_cap", scalar.init_cap(F.lit("hello world")), "INITCAP('hello world')", "Hello World"),
        ("position", scalar.position("ll", "s"), "POSITION('ll' IN s)", 3),
        ("position_absent", scalar.position("zz", "s"), "POSITION('zz' IN s)", 0),
        ("substring_from", scalar.substring_sql("s", 2), "SUBSTRING(s FROM 2)", "ello"),
        ("substring_for", scalar.substring_sql("s", 2, 3), "SUBSTRING(s FROM 2 FOR 3)", "ell"),
        ("overlay", scalar.overlay_sql("s", F.lit("XX"), 2, 2), "OVERLAY(s PLACING 'XX' FROM 2 FOR 2)", "HXXlo"),
        ("trim_both", scalar.trim_sql("pad"), "TRIM(BOTH ' ' FROM pad)", "x"),
        ("trim_leading", scalar.trim_sql("pad", "LEADING"), "TRIM(LEADING ' ' FROM pad)", "x  "),
        ("trim_trailing", scalar.trim_sql("pad", "TRAILING"), "TRIM(TRAILING ' ' FROM pad)", "  x"),
        ("concat", F.concat("s", F.lit("!")), "CONCAT(s, '!')", "Hello!"),
        ("like", F.col("s").like("Hel%"), "s LIKE 'Hel%'", True),
        ("similar_to", scalar.similar_to("s", "H.*o"), "s RLIKE '^(?:H.*o)$'", True),
        # -- math functions --------------------------------------------------
        ("abs", F.abs("neg"), "ABS(neg)", 5),
        ("sign", F.signum("neg"), "SIGN(neg)", -1.0),
        ("mod", F.col("seven") % 3, "MOD(seven, 3)", 1),
        ("exp_ln", F.round(F.ln(F.exp("one")), 6), "ROUND(LN(EXP(one)), 6)", 1.0),
        ("log10", F.log10(F.lit(1000.0)), "LOG10(1000.0)", 3.0),
        ("power", F.pow("seven", 2), "POWER(seven, 2)", 49.0),
        ("sqrt", F.sqrt(F.lit(49.0)), "SQRT(49.0)", 7.0),
        ("floor", F.floor("f"), "FLOOR(f)", 3),
        ("ceil", F.ceil("f"), "CEIL(f)", 4),
        ("round", F.round("f", 1), "ROUND(f, 1)", 3.1),
        ("pi", F.round(F.lit(math.pi), 6), "ROUND(PI(), 6)", 3.141593),
        # -- temporal functions ----------------------------------------------
        ("extract_year", F.year("d"), "EXTRACT(YEAR FROM d)", 2024),
        ("extract_month", F.month("d"), "EXTRACT(MONTH FROM d)", 3),
        ("extract_day", F.dayofmonth("d"), "EXTRACT(DAY FROM d)", 15),
        ("quarter", scalar.quarter("d"), "QUARTER(d)", 1),
        ("floor_to_hour", scalar.floor_to_unit("t", "hour"), "DATE_TRUNC('hour', t)",
         datetime.datetime(2024, 3, 15, 10, 0)),
        ("overlaps", scalar.temporal_overlaps(
            F.lit("2024-01-01").cast("date"), F.lit("2024-06-01").cast("date"),
            F.lit("2024-03-01").cast("date"), F.lit("2024-09-01").cast("date")),
         "CAST('2024-01-01' AS DATE) < CAST('2024-09-01' AS DATE) "
         "AND CAST('2024-03-01' AS DATE) < CAST('2024-06-01' AS DATE)", True),
        # -- comparison / logic / conditional --------------------------------
        ("between", F.col("seven").between(1, 10), "seven BETWEEN 1 AND 10", True),
        ("in_", F.col("seven").isin(1, 7, 9), "seven IN (1, 7, 9)", True),
        ("is_null", F.col("nul").isNull(), "nul IS NULL", True),
        ("coalesce", F.coalesce("nul", "seven"), "COALESCE(nul, seven)", 7),
        ("case_when", F.when(F.col("seven") > 5, "big").otherwise("small"),
         "CASE WHEN seven > 5 THEN 'big' ELSE 'small' END", "big"),
        ("nullif", F.nullif("one", "one"), "NULLIF(one, one)", None),
        ("cast", F.col("f").cast("int"), "CAST(f AS INT)", 3),
        # -- array / composite -----------------------------------------------
        ("cardinality", scalar.cardinality(F.col("arr")), "CARDINALITY(arr)", 3),
        ("element_at", F.element_at("arr", 2), "ELEMENT_AT(arr, 2)", 20),
        ("element_single", scalar.element(F.array(F.lit(9))), "ELEMENT_AT(ARRAY(9), 1)", 9),
        # -- post-1.3 native extras (§2.9 extras row) ------------------------
        ("md5", F.md5(F.encode(F.lit("abc"), "UTF-8")), "MD5('abc')",
         "900150983cd24fb0d6963f7d28e17f72"),
        ("regexp_extract", F.regexp_extract("s", "H(.l)", 1), "REGEXP_EXTRACT(s, 'H(.l)', 1)", "el"),
        ("lpad", F.lpad("s", 7, "*"), "LPAD(s, 7, '*')", "**Hello"),
    ]


@pytest.fixture(scope="module")
def fixture_row(spark):
    df = (
        spark.createDataFrame(
            [("Hello", "  x  ", -5, 7, 1, 3.14, None, "2024-03-15", "2024-03-15 10:42:01", [10, 20, 30])],
            "s STRING, pad STRING, neg INT, seven INT, one INT, f DOUBLE, "
            "nul INT, d_s STRING, t_s STRING, arr ARRAY<INT>",
        )
        .withColumn("d", F.to_date("d_s"))
        .withColumn("t", F.to_timestamp("t_s"))
    )
    df.createOrReplaceTempView("expr_fixture")
    return df


def _check(got, want, name):
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-9), name
    else:
        assert got == want, name


def test_all_apis_table_expressions(spark, fixture_row):
    """API #1: Table-API Column expressions — one action for every case."""
    cases = _cases()
    row = fixture_row.select(
        *[col.alias(f"c{i}") for i, (_, col, _, _) in enumerate(cases)]
    ).collect()[0]
    for i, (name, _, _, want) in enumerate(cases):
        _check(row[i], want, name)


def test_all_apis_sql(spark, fixture_row):
    """API #2: the same expressions as SQL through TableEnvironment.sql."""
    cases = _cases()
    env = TableEnvironment.create(spark)
    selects = ", ".join(f"{sql} AS c{i}" for i, (_, _, sql, _) in enumerate(cases))
    row = env.sql(f"SELECT {selects} FROM expr_fixture").collect()[0]
    for i, (name, _, _, want) in enumerate(cases):
        _check(row[i], want, name)


def test_both_apis_agree_beyond_literals(spark, fixture_row):
    """Cross-check: Table-API and SQL spellings produce identical rows even
    where the expected value is data-dependent (mirrors testAllApis's
    three-way assertion)."""
    env = TableEnvironment.create(spark)
    table_row = fixture_row.select(
        scalar.trim_sql("pad", "BOTH", " x").alias("a"),
        scalar.substring_sql("s", 3).alias("b"),
        F.round(F.radians(F.lit(180.0)), 6).alias("c"),
    ).collect()[0]
    sql_row = env.sql(
        "SELECT BTRIM(pad, ' x') AS a, SUBSTRING(s FROM 3) AS b, "
        "ROUND(RADIANS(180.0), 6) AS c FROM expr_fixture"
    ).collect()[0]
    assert table_row == sql_row
