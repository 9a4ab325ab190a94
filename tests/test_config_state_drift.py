"""Branch pins for the staged tf_config_state_drift entry on a SYNTHETIC
corpus — the fixture corpus has no partial apply and no orphaned state
resource, so its golden oracle never exercises ``count_drift`` or
``applied_not_declared``; this corpus manufactures both (r8 review
finding: the entry previously reported in_sync on mere address presence,
masking partial applies)."""

import json

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
"""


def _state(resources):
    return json.dumps(
        {"version": 4, "terraform_version": "1.5.0", "resources": resources}
    )


def _inst(n):
    return [{"index_key": i, "attributes": {"id": f"i-{i}"}} for i in range(n)]


def test_drift_branches_on_synthetic_corpus(spark, tmp_path):
    (tmp_path / "main.tf").write_text(_TF)
    (tmp_path / "terraform.tfstate").write_text(
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
                # data-mode state rows never count as applied instances
                {"mode": "data", "type": "aws_ami", "name": "ubuntu",
                 "provider": "p", "instances": _inst(1)},
            ]
        )
    )
    eng = TerraformEngine(
        spark,
        config_paths=[f"{tmp_path}/*.tf"],
        state_paths=[f"{tmp_path}/*.tfstate"],
        cache=False,
    )
    out = _config_state_drift_frame(eng.table("terraform_resource"))
    rows = {
        r.address: (r.declared, r.expected_instances, r.applied_instances, r.status)
        for r in out.collect()
    }
    assert rows == {
        "aws_instance.web": (True, 3, 2, "count_drift"),
        "aws_s3_bucket.logs": (True, 1, 1, "in_sync"),
        "aws_sqs_queue.dyn": (True, None, 5, "in_sync"),
        "aws_eip.orphan": (False, None, 1, "applied_not_declared"),
    }
