"""_unused_decls_frame device tests: the token regex must match a
LITERAL dot (the r9 review caught a lost escaping level that turned
`var\\.` into `var.`, so prose like 'various' minted a phantom ref
'ous' and falsely marked declarations used)."""

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.catalog import (
    _LOCAL_TOKEN_RE,
    _MODULE_TOKEN_RE,
    _VAR_TOKEN_RE,
    _unused_decls_frame,
)

_SCHEMA = (
    "file_kind string, tf_table string, path string, start_line long, "
    "source string, name string"
)


def test_token_regex_dot_is_literal(spark):
    wide = spark.createDataFrame(
        [
            ("config", "terraform_variable", "a.tf", 1,
             'variable "ous" {}', "ous"),
            ("config", "terraform_variable", "a.tf", 5,
             'variable "real_ref" {}', "real_ref"),
            # prose containing 'various' must NOT count as var.ous
            ("config", "terraform_resource", "a.tf", 10,
             "# see various options\nami = var.real_ref", None),
        ],
        _SCHEMA,
    )
    rows = {
        r["name"]: (r["n_ref_blocks"], r["status"])
        for r in _unused_decls_frame(
            wide,
            "terraform_variable",
            _VAR_TOKEN_RE,
            ["name"],
        ).collect()
    }
    assert rows["real_ref"] == (1, "used")
    assert rows["ous"] == (0, "unused")


def test_distinct_block_identity(spark):
    # two tokens in ONE block count the block once; the same name in a
    # SECOND block counts again
    wide = spark.createDataFrame(
        [
            ("config", "terraform_variable", "a.tf", 1,
             'variable "x" {}', "x"),
            ("config", "terraform_resource", "a.tf", 10,
             "a = var.x\nb = var.x", None),
            ("config", "terraform_output", "b.tf", 3,
             "value = var.x", None),
        ],
        _SCHEMA,
    )
    rows = _unused_decls_frame(
        wide,
        "terraform_variable",
        _VAR_TOKEN_RE,
        ["name"],
    ).collect()
    assert rows[0]["n_ref_blocks"] == 2


def test_local_token_regex_dot_is_literal(spark):
    wide = spark.createDataFrame(
        [
            ("config", "terraform_local", "a.tf", 1, "locals {}", "ze"),
            # prose 'localize' must NOT count as local.ze
            ("config", "terraform_output", "a.tf", 9,
             "# localize settings later", None),
        ],
        _SCHEMA,
    )
    rows = _unused_decls_frame(
        wide, "terraform_local", _LOCAL_TOKEN_RE, ["name"]
    ).collect()
    assert rows[0]["n_ref_blocks"] == 0 and rows[0]["status"] == "unused"


def test_token_regex_left_boundary(spark):
    """r9 advice: 'var./local./module.' must not match inside a longer
    attribute chain — 'aws_ssm_parameter.dbvar.value' minted a phantom
    var ref 'value', 'mylocal.attr' a phantom local ref 'attr'."""
    wide = spark.createDataFrame(
        [
            ("config", "terraform_variable", "a.tf", 1,
             'variable "value" {}', "value"),
            ("config", "terraform_variable", "a.tf", 5,
             'variable "real" {}', "real"),
            # chain ends in 'var.value' but is NOT a var traversal
            ("config", "terraform_resource", "a.tf", 10,
             "x = aws_ssm_parameter.dbvar.value\ny = var.real", None),
        ],
        _SCHEMA,
    )
    rows = {
        r["name"]: (r["n_ref_blocks"], r["status"])
        for r in _unused_decls_frame(
            wide, "terraform_variable", _VAR_TOKEN_RE, ["name"]
        ).collect()
    }
    assert rows["real"] == (1, "used")
    assert rows["value"] == (0, "unused")


def test_local_and_module_token_left_boundary(spark):
    wide_local = spark.createDataFrame(
        [
            ("config", "terraform_local", "a.tf", 1, "locals {}", "attr"),
            # 'mylocal.attr' must NOT count as local.attr
            ("config", "terraform_output", "a.tf", 9,
             "value = mylocal.attr", None),
        ],
        _SCHEMA,
    )
    r = _unused_decls_frame(
        wide_local, "terraform_local", _LOCAL_TOKEN_RE, ["name"]
    ).collect()[0]
    assert (r["n_ref_blocks"], r["status"]) == (0, "unused")

    wide_module = spark.createDataFrame(
        [
            ("config", "terraform_module", "a.tf", 1, 'module "out" {}', "out"),
            # 'submodule.out' must NOT count as module.out
            ("config", "terraform_output", "a.tf", 9,
             "value = submodule.out", None),
        ],
        _SCHEMA,
    )
    r = _unused_decls_frame(
        wide_module, "terraform_module", _MODULE_TOKEN_RE, ["name"]
    ).collect()[0]
    assert (r["n_ref_blocks"], r["status"]) == (0, "unused")
