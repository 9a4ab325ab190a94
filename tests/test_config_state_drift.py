"""Branch pins for the tf_config_state_drift entry on a SYNTHETIC
corpus — the fixture corpus has no partial apply, no orphaned state
resource, and no zero-count declaration, so its golden oracle never
exercises ``count_drift``, ``applied_not_declared``, or the literal
``count = 0`` recovery (r8 review finding: the entry previously reported
in_sync on mere address presence, masking partial applies; r8 advice:
a literal count = 0 with nothing applied is in_sync, not drift, and
kind must come from the engine's routing, not path suffixes)."""

import json

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.catalog import _config_state_drift_frame
from steampipe_plugin_terraform_spark.engine import TerraformEngine

_TF = """
resource "aws_instance" "web" {
  ami   = "ami-1"
  count = 3
}

resource "aws_s3_bucket" "logs" {
}

resource "aws_sqs_queue" "dyn" {
  count = var.n
}

resource "aws_eip" "off" {
  count = 0
}

resource "aws_eip" "stray" {
  count = 0
}
"""


def _state(resources):
    return json.dumps(
        {"version": 4, "terraform_version": "1.5.0", "resources": resources}
    )


def _inst(n):
    return [{"index_key": i, "attributes": {"id": f"i-{i}"}} for i in range(n)]


def _drift_input(eng):
    """The entry's own input shape: wide resource rows + file_kind."""
    return eng.wide().filter(F.col("tf_table") == "terraform_resource").select(
        "address", "count", "count_src", "for_each", "mode", "file_kind"
    )


def test_drift_branches_on_synthetic_corpus(spark, tmp_path):
    (tmp_path / "main.tf").write_text(_TF)
    # state under a custom name: the suffix heuristic the entry used to
    # re-derive kind from would drop this file from the audit entirely;
    # the engine's explicit state routing must keep it in
    (tmp_path / "prod.state.backup").write_text(
        _state(
            [
                # partial apply: config declares count = 3, state holds 2
                {"mode": "managed", "type": "aws_instance", "name": "web",
                 "provider": "p", "instances": _inst(2)},
                # matches the implicit single instance
                {"mode": "managed", "type": "aws_s3_bucket", "name": "logs",
                 "provider": "p", "instances": _inst(1)},
                # dynamic count (var.n) — statically unknowable, any
                # instance count is in_sync
                {"mode": "managed", "type": "aws_sqs_queue", "name": "dyn",
                 "provider": "p", "instances": _inst(5)},
                # orphaned state resource with no config block
                {"mode": "managed", "type": "aws_eip", "name": "orphan",
                 "provider": "p", "instances": _inst(1)},
                # declared count = 0 but an instance applied anyway
                {"mode": "managed", "type": "aws_eip", "name": "stray",
                 "provider": "p", "instances": _inst(1)},
                # data-mode state rows never count as applied instances
                {"mode": "data", "type": "aws_ami", "name": "ubuntu",
                 "provider": "p", "instances": _inst(1)},
            ]
        )
    )
    eng = TerraformEngine(
        spark,
        config_paths=[f"{tmp_path}/*.tf"],
        state_paths=[f"{tmp_path}/prod.state.backup"],
        cache=False,
    )
    out = _config_state_drift_frame(_drift_input(eng))
    rows = {
        r.address: (r.declared, r.expected_instances, r.applied_instances, r.status)
        for r in out.collect()
    }
    assert rows == {
        "aws_instance.web": (True, 3, 2, "count_drift"),
        "aws_s3_bucket.logs": (True, 1, 1, "in_sync"),
        "aws_sqs_queue.dyn": (True, None, 5, "in_sync"),
        "aws_eip.orphan": (False, None, 1, "applied_not_declared"),
        # NullIfZero recovery: literal count = 0 (count NULL, count_src
        # '0') means expected 0 — zero applied is the declaration working
        # as written (absent from state, NOT declared_not_applied)...
        "aws_eip.off": (True, 0, 0, "in_sync"),
        # ...while an applied instance against expected 0 IS drift
        "aws_eip.stray": (True, 0, 1, "count_drift"),
    }


def test_drift_uses_engine_kind_not_suffix(spark, tmp_path):
    """A custom-named config file routed as config must land on the
    declared side even though it doesn't end in .tf."""
    (tmp_path / "web.hcl").write_text(
        'resource "aws_instance" "web" {\n  ami = "ami-1"\n}\n'
    )
    eng = TerraformEngine(
        spark, config_paths=[f"{tmp_path}/web.hcl"], cache=False
    )
    out = _config_state_drift_frame(_drift_input(eng))
    rows = {r.address: r.status for r in out.collect()}
    assert rows == {"aws_instance.web": "declared_not_applied"}
