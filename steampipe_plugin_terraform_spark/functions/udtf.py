"""Python UDTFs (Spark 4 table functions) exposing the engine's parsers
directly in SQL — the §2.9 user-extensibility surface the reference lacks.

After ``register_udtfs(spark)``:

    SELECT * FROM hcl_blocks('resource "aws_instance" "a" { ami = "x" }');

yields one row per top-level block with positions and canonical body JSON —
the parse spine as a composable SQL citizen (lateral-joinable against any
table carrying HCL text).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="block_type string, labels array<string>, body_json string, start_line int, end_line int")
class HclBlocks:
    """Table function: HCL source text → one row per top-level block."""

    def eval(self, src: str):  # noqa: D102
        if src is None:
            return
        from ..functions.jsonenc import canonical_json
        from ..hcl import parse_file

        for blk in parse_file(src):
            yield (
                blk.block_type,
                list(blk.labels),
                canonical_json(blk.body),
                blk.start_line,
                blk.end_line,
            )


def register_udtfs(spark) -> None:
    spark.udtf.register("hcl_blocks", HclBlocks)
