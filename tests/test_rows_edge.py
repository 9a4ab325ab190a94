"""Edge-case parser/builder fidelity: heredocs, numerics, dynamic blocks,
repeated nested blocks, expression shapes (SURVEY §7.4 risk 2)."""

import json
import pathlib

import pytest

from steampipe_plugin_terraform_spark.tfcore.rows import build_rows_for_file

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "edge" / "edge.tf"


@pytest.fixture(scope="module")
def rows():
    return build_rows_for_file(str(FIXTURE), "config", FIXTURE.read_text())


def _resource(rows, name):
    return next(r for r in rows if r["tf_table"] == "terraform_resource" and r["name"] == name)


def test_heredoc_literal(rows):
    args = json.loads(_resource(rows, "r")["arguments"])
    assert args["assume_role_policy"].startswith('{\n  "Version": "2012-10-17"')
    assert args["assume_role_policy"].endswith("}\n")
    assert args["max_session_duration"] == 3600


def test_numeric_shapes(rows):
    args = json.loads(_resource(rows, "asg")["arguments"])
    assert args["spot_price"] == 0.0042      # float stays float
    assert args["adjustment"] == -3          # unary minus folds to int
    assert args["min_size"] == 0 and args["max_size"] == 10


def test_expression_shapes(rows):
    args = json.loads(_resource(rows, "asg")["arguments"])
    assert args["desired_capacity"] == '${var.env == "prod" ? 10 : 2}'   # ternary
    assert args["vpc_zone_identifier"] == "${module.vpc.private_subnets[*]}"  # splat
    idx = json.loads(_resource(rows, "indexed")["arguments"])
    assert idx["ami"] == '${var.amis["us-west-2"]}'                       # index
    assert idx["subnet_id"] == "${element(module.vpc.private_subnets, 0)}"  # call


def test_repeated_nested_block_becomes_list(rows):
    args = json.loads(_resource(rows, "asg")["arguments"])
    assert [t["key"] for t in args["tag"]] == ["Name", "env"]
    assert args["tag"][1]["value"] == "${var.env}"


def test_dynamic_block_nests(rows):
    args = json.loads(_resource(rows, "asg")["arguments"])
    assert args["dynamic"]["ebs"]["for_each"] == "${var.disks}"
    assert args["dynamic"]["ebs"]["content"]["size"] == "${ebs.value}"


def test_count_zero_is_null_but_count_src_kept(rows):
    # NullIfZero: count=0 → NULL; count_src keeps the literal "0"
    idx = _resource(rows, "indexed")
    assert idx["count"] is None
    assert idx["count_src"] == "0"


def test_mixed_numeric_list_default(rows):
    var = next(r for r in rows if r["tf_table"] == "terraform_variable" and r["name"] == "disks")
    assert var["default_value"] == "[100,200.5]"
    assert var["type"] == "list(number)"


def test_for_expression_output(rows):
    out = next(r for r in rows if r["tf_table"] == "terraform_output")
    assert out["value"] == '"${[for s in module.vpc.private_subnets : s]}"'
