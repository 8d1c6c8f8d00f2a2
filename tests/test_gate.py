"""SQL admission gate matrix — mirrors reference tests/test_executor.py:84-174
including the CTE-bypass attack (reference query/executor.py:74-79)."""

import pytest

from iceberg_explorer_spark.errors import InvalidSQLError
from iceberg_explorer_spark.gate import validate_sql, validate_sql_lexical

VALID = [
    "SELECT 1",
    "SELECT * FROM range(10)",
    "select id, name from range(10)",
    "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
    "EXPLAIN SELECT 1",
    "SELECT 1;",
    "SELECT 1; -- trailing comment after terminator",
    "VALUES (1, 'a'), (2, 'b')",
    "SELECT a.id FROM range(5) a JOIN range(5) b ON a.id = b.id",
]

INVALID_LEXICAL = [
    "",
    "   ",
    "INSERT INTO t VALUES (1)",
    "UPDATE t SET x = 1",
    "DELETE FROM t",
    "DROP TABLE t",
    "CREATE TABLE t (x INT)",
    "ALTER TABLE t ADD COLUMN y INT",
    "TRUNCATE TABLE t",
    "ATTACH 'f.db'",
    "SELECT 1; DROP TABLE t",
    "WITH t AS (SELECT 1) INSERT INTO x SELECT * FROM t",  # CTE bypass
    "COPY t TO 'f.csv'",
    "GRANT ALL ON t TO u",
]


@pytest.mark.parametrize("sql", VALID)
def test_valid_sql_admitted(spark, sql):
    assert validate_sql(spark, sql)


@pytest.mark.parametrize("sql", INVALID_LEXICAL)
def test_invalid_sql_rejected(sql):
    with pytest.raises(InvalidSQLError):
        validate_sql_lexical(sql)


def test_plan_gate_rejects_disguised_write(spark):
    # keyword not at line start and lowercase — lexical layer already blocks;
    # the plan layer independently rejects too
    with pytest.raises(InvalidSQLError):
        validate_sql(spark, "insert into x values (1)")


def test_describe_and_show_admitted(spark, oracle):
    # SHOW/DESCRIBE parse as commands but are read-only → admitted
    assert validate_sql(spark, "SHOW TABLES")
    spark.range(3).createOrReplaceTempView("gate_desc_test")
    assert validate_sql(spark, "DESCRIBE TABLE gate_desc_test")


def test_comments_stripped():
    assert validate_sql_lexical("-- lead\nSELECT 1 /* block */") == "SELECT 1"
    with pytest.raises(InvalidSQLError):
        validate_sql_lexical("/* only a comment */")


# ---------------------------------------------------------------------------
# Generative gate fuzz: read-only enforcement as a PROPERTY, not a matrix.
# ---------------------------------------------------------------------------


def test_gate_fuzz_admitted_statements_are_read_only(spark):
    """Hypothesis assembles SQL from write-shaped and query-shaped
    fragments; the property is the gate's actual guarantee: anything
    ADMITTED parses to a read-only plan (query, or Explain/Describe/Show
    command) — no generated statement may slip a write/DDL class through,
    no matter how fragments compose. Rejections just need to be the typed
    error (never a crash)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_explorer_spark.errors import InvalidSQLError
    from iceberg_explorer_spark.gate import validate_sql

    frags = st.sampled_from(
        [
            "SELECT 1",
            "SELECT * FROM range(3)",
            "WITH t AS (SELECT 1 AS x) SELECT x FROM t",
            "EXPLAIN SELECT 1",
            "SHOW TABLES",
            "DESCRIBE range(3)",
            "INSERT INTO t VALUES (1)",
            "DROP TABLE t",
            "CREATE TABLE t (x INT)",
            "DELETE FROM t",
            "UPDATE t SET x = 1",
            "MERGE INTO t USING s ON 1=1 WHEN MATCHED THEN DELETE",
            "TRUNCATE TABLE t",
            "VACUUM t",
            "SELECT 1; DROP TABLE t",
            "-- comment\nSELECT 2",
            "/* block */ SELECT 3",
            "",
            "   ",
            "garbage ( not sql",
        ]
    )
    glue = st.sampled_from(["", " ", "; ", " UNION ALL ", "\n"])

    @settings(max_examples=150, deadline=None)
    @given(a=frags, g=glue, b=frags)
    def run(a, g, b):
        sql = a + g + b
        try:
            body = validate_sql(spark, sql)
        except InvalidSQLError:
            return  # rejected with the typed error — fine
        # ADMITTED: must parse to a read-only plan class
        cls = (
            spark._jsparkSession.sessionState()
            .sqlParser()
            .parsePlan(body)
            .getClass()
            .getSimpleName()
        )
        is_command = (
            cls.endswith(("Command", "Statement"))
            or "Insert" in cls
            or "Write" in cls
        )
        assert (not is_command) or cls.startswith(
            ("Explain", "Describe", "Show")
        ), (sql, cls)

    run()
