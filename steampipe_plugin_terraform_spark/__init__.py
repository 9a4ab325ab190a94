"""steampipe_plugin_terraform_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of turbot/steampipe-plugin-terraform.

The reference (a Go Steampipe plugin) exposes seven fixed-schema SQL tables over
Terraform artifacts (HCL config, plan JSON, state JSON) and delegates all
relational processing to a host engine. Here the "host engine" role is played by
Spark SQL / Catalyst: we parse once into a canonical blocks DataFrame on the
executors, derive the seven tables as projections, and register them as views.

Reference parity citations use file:line into /root/reference/.
"""

__all__ = ["TerraformEngine", "get_spark"]

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import steampipe_plugin_terraform_spark.hcl` pyspark-free
    if name == "TerraformEngine":
        from steampipe_plugin_terraform_spark.engine import TerraformEngine

        return TerraformEngine
    if name == "get_spark":
        from steampipe_plugin_terraform_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
