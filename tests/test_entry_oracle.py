"""The correctness gate, run locally: every queries() entry must hash-match
its oracle_sql() on the sf0.01 fixtures (same check the driver performs)."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare_frames, duckdb_conn

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


def test_every_query_has_oracle():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [k for k in q if k not in o]
    # non-SQL-expressible ops may legitimately omit the oracle; keep the
    # list explicit so additions are a conscious decision
    allowed_missing: set[str] = set(entry_mod.ROWS_ONLY_QUERIES) if hasattr(
        entry_mod, "ROWS_ONLY_QUERIES"
    ) else set()
    assert set(missing) <= allowed_missing, f"queries without oracle: {missing}"


@pytest.fixture(scope="module")
def oracle(request):
    conn = duckdb_conn(SF_ORACLE)
    yield conn
    conn.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle, name):
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    try:
        if name not in oracles:
            df = queries[name](spark, SF_ORACLE)
            assert df.count() >= 0, f"{name}: rows-only check failed"
            return
        spark_pdf = queries[name](spark, SF_ORACLE).toPandas()
        oracle_pdf = oracle.execute(oracles[name]).df()
        problems = compare_frames(spark_pdf, oracle_pdf)
        assert not problems, f"{name}:\n" + "\n".join(problems)
    finally:
        # ANN/dedup queries persist index subtrees; release them so 120
        # sequential checks don't accumulate cache pressure in one JVM
        release_tracked()
