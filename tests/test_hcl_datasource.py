"""format("hcl") Python Data Source: schema, partitioning, error modes."""

import os

import pytest

from steampipe_plugin_terraform_spark.functions.jsonenc import canonical_json
from steampipe_plugin_terraform_spark.hcl import parse_file
from steampipe_plugin_terraform_spark.sources.hcl_datasource import register_hcl_datasource

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_hcl_datasource(spark)


def test_reads_blocks_with_positions_and_source(spark):
    path = os.path.join(FIXTURES, "config", "main.tf")
    df = spark.read.format("hcl").load(path)
    rows = {(r.block_type, tuple(r.labels), r.start_line): r for r in df.collect()}
    src = open(path, encoding="utf-8").read()
    expected = parse_file(src)
    assert len(rows) == len(expected)
    lines = src.split("\n")
    for blk in expected:
        r = rows[(blk.block_type, tuple(blk.labels), blk.start_line)]
        assert r.path == path
        assert r.end_line == blk.end_line
        assert r.body_json == canonical_json(blk.body)
        assert r.source == "\n".join(lines[blk.start_line - 1 : blk.end_line])


def test_glob_and_partition_binpack(spark, tmp_path):
    for i in range(7):
        (tmp_path / f"f{i}.tf").write_text(f'resource "null_resource" "r{i}" {{ n = {i} }}\n')
    df = spark.read.format("hcl").option("numPartitions", "3").load(str(tmp_path / "*.tf"))
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 7
    assert {r.block_type for r in df.collect()} == {"resource"}


def test_missing_path_yields_empty_not_error(spark):
    df = spark.read.format("hcl").load("/nonexistent/dir/*.tf")
    assert df.count() == 0


def test_on_error_fail_names_file(spark, tmp_path):
    (tmp_path / "bad.tf").write_text('resource "x" {{{ not hcl')
    with pytest.raises(Exception, match="bad.tf"):
        spark.read.format("hcl").load(str(tmp_path / "*.tf")).collect()


def test_on_error_skip_keeps_good_files(spark, tmp_path):
    (tmp_path / "bad.tf").write_text('resource "x" {{{ not hcl')
    (tmp_path / "good.tf").write_text('output "o" { value = 1 }\n')
    df = spark.read.format("hcl").option("on_error", "skip").load(str(tmp_path / "*.tf"))
    rows = df.collect()
    assert len(rows) == 1 and rows[0].block_type == "output"


def test_multiple_comma_globs(spark, tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    (tmp_path / "a" / "x.tf").write_text('locals { a = 1 }\n')
    (tmp_path / "b" / "y.tf").write_text('locals { b = 2 }\n')
    df = spark.read.format("hcl").load(f"{tmp_path}/a/*.tf,{tmp_path}/b/*.tf")
    assert df.count() == 2
