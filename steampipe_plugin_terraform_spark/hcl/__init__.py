"""Pure-Python HCL2 parser.

The reference delegates HCL parsing to the kics Terraform parser
(/root/reference/terraform/utils.go:171-181). That parser's observable output
contract — nested dicts whose literal values are native and whose non-literal
expressions are "${...}" interpolation strings — is what the seven tables are
built from, so this module reproduces that contract from scratch.

Unlike the reference (which serializes ALL parsing behind a global mutex,
/root/reference/terraform/utils.go:35-36,256-257), this parser is pure and
state-free per call, so Spark runs it executor-parallel inside mapInPandas.
"""

from steampipe_plugin_terraform_spark.hcl.parser import (
    Block,
    HCLParseError,
    parse_document,
    parse_file,
)

__all__ = ["Block", "HCLParseError", "parse_document", "parse_file"]
