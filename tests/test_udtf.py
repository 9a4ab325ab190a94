"""Python UDTF surface: the HCL parser as a SQL table function."""

from steampipe_plugin_terraform_spark.functions.udtf import register_udtfs


def test_hcl_blocks_udtf(spark):
    register_udtfs(spark)
    rows = spark.sql(
        """
        SELECT block_type, labels, get_json_object(body_json, '$.ami') AS ami, start_line
        FROM hcl_blocks('resource "aws_instance" "a" {\n  ami = "x"\n}\nlocals { y = 1 }')
        ORDER BY start_line
        """
    ).collect()
    assert [(r["block_type"], r["ami"]) for r in rows] == [("resource", "x"), ("locals", None)]
    assert rows[0]["labels"] == ["aws_instance", "a"]


def test_hcl_blocks_udtf_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, 'provider "aws" { region = "us-west-2" }')], "id int, src string"
    ).createOrReplaceTempView("hcl_src")
    rows = spark.sql(
        """
        SELECT s.id, b.block_type, get_json_object(b.body_json, '$.region') AS region
        FROM hcl_src s, LATERAL hcl_blocks(s.src) b
        """
    ).collect()
    assert [(r["id"], r["block_type"], r["region"]) for r in rows] == [(1, "provider", "us-west-2")]
