"""Property test: asof_join must agree with pandas.merge_asof (the
reference backward-inclusive implementation) on randomized inputs —
hundreds of generated cases catch boundary shapes (empty sides, all-tied
times, groups with no matches) that example tests miss."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_pyspark_etl_imdb_spark.operators.asof import asof_join

row = st.tuples(
    st.integers(min_value=0, max_value=2),  # group
    st.integers(min_value=0, max_value=50),  # time
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(row, min_size=1, max_size=12),
    right_rows=st.lists(row, min_size=0, max_size=12),
)
def test_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_pdf = pd.DataFrame(
        [(g, t, i) for i, (g, t) in enumerate(left_rows)],
        columns=["grp", "t", "lid"],
    )
    # deduplicate right on (grp, t): pandas keeps the LAST of tied rows,
    # matching asof_join's tie_col=greatest semantics once keys are unique
    right_pdf = (
        pd.DataFrame(
            [(g, t, float(i)) for i, (g, t) in enumerate(right_rows)],
            columns=["grp", "t", "v"],
        )
        .astype({"grp": "int64", "t": "int64", "v": "float64"})
        .drop_duplicates(["grp", "t"], keep="last")
        .reset_index(drop=True)
    )

    want = pd.merge_asof(
        left_pdf.sort_values("t", kind="stable"),
        right_pdf.sort_values("t", kind="stable"),
        on="t",
        by="grp",
        direction="backward",
    )
    expected = {
        r.lid: (None if pd.isna(r.v) else r.v) for r in want.itertuples()
    }

    left = spark.createDataFrame(left_pdf, "grp long, t long, lid long")
    if len(right_pdf):
        right = spark.createDataFrame(right_pdf, "grp long, t long, v double")
    else:
        right = spark.createDataFrame([], "grp long, t long, v double")
    got = {
        r.lid: r.v for r in asof_join(left, right, on="t", by="grp").collect()
    }
    assert got == expected
