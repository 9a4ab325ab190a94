"""zscore_by_group NULL semantics: singleton/zero-variance groups must emit
true SQL NULLs (a float NaN through DoubleType dodges `z IS NULL`)."""


def test_zscore_singleton_and_zero_variance_are_sql_null(spark):
    from steampipe_plugin_terraform_spark.operators.text import zscore_by_group

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "solo", 7), (4, "flat", 5), (5, "flat", 5)],
        "doc_id long, lang string, n_chars long",
    )
    out = zscore_by_group(df, group_col="lang")
    nulls = sorted(r.doc_id for r in out.filter("z IS NULL").collect())
    assert nulls == [3, 4, 5]
    # and no NaN smuggled through for the valid group
    vals = {r.doc_id: r.z for r in out.filter("z IS NOT NULL").collect()}
    assert set(vals) == {1, 2} and all(v == v for v in vals.values())
