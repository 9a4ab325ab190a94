"""PySpark-native analytics engine with the query and data-processing
capabilities of turbot/steampipe-plugin-terraform (reference read-only at
/root/reference), re-expressed Spark-first: declarative DataFrame lineage,
Catalyst optimization, executor-parallel parsing.
"""

from .engine import TABLE_COLUMNS, TABLE_NAMES, TerraformEngine
from .session import get_spark

__all__ = ["TerraformEngine", "TABLE_COLUMNS", "TABLE_NAMES", "get_spark"]
