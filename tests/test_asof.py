"""As-of join operator edge cases."""

from steampipe_plugin_terraform_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 10, 300), (4, 99, 50)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 200, "b"), (10, 300, "c"), (77, 1, "z")],
        "k long, t long, v string",
    )
    out = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, left_on="k", right_on="k",
            left_time="t", right_time="t", payload_cols=["v"],
        ).collect()
    }
    assert out[1] == "a"     # equal timestamp is inclusive (<=)
    assert out[2] == "b"     # latest at-or-before 250
    assert out[3] == "c"
    assert out[4] is None    # key with no right rows → NULL payload


def test_asof_left_rows_preserved(spark):
    left = spark.createDataFrame([(i, i % 3, i * 10) for i in range(30)], "lid long, k long, t long")
    right = spark.createDataFrame([(0, 5, "x")], "k long, t long, v string")
    res = asof_join(left, right, "k", "k", "t", "t", ["v"])
    assert res.count() == 30  # left join: every left row survives
