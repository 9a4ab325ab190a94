"""Z-order layout: the pruning property, measured on real parquet footers.

The q_zorder_pruned_scan entry's VALUES are layout-independent (the oracle
checks them); what the layout buys is row-group pruning from footer
min/max stats on BOTH filter columns. These tests pin the structural
tradeoff: a z-clustered layout bounds every file's (x, y) box in BOTH
dimensions (so even a secondary-column-only predicate prunes), while a
linear single-column sort leaves the secondary column's stats useless —
at the cost of coarser primary-column pruning (the z key spends its bits
across dimensions; with 16 files each dimension gets ~2 bits of
resolution)."""

import glob

import pyarrow.parquet as pq
import pytest

from steampipe_plugin_terraform_spark.operators import storage

SF = "/root/testdata/sf0.001"


def _files_intersecting(path_glob: str, box: dict) -> tuple[int, int]:
    """(files whose footer-stats box intersects ``box``, total files)."""
    hit, total = 0, 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.to_arrow_schema().names
        total += 1
        intersects = True
        for col, (lo, hi) in box.items():
            i = schema_names.index(col)
            cmins, cmaxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                cmins.append(st.min)
                cmaxs.append(st.max)
            if min(cmins) > hi or max(cmaxs) < lo:
                intersects = False
                break
        if intersects:
            hit += 1
    return hit, total


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    root = tmp_path_factory.mktemp("zorder")
    zpath, lpath = str(root / "z"), str(root / "linear")
    storage.write_zordered(li, zpath, "l_partkey", "l_suppkey", num_files=16)
    # linear control: same file count, sorted by the PRIMARY column only
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return zpath, lpath


def test_zorder_prunes_2d_box(layouts):
    zpath, _ = layouts
    hit, total = _files_intersecting(
        zpath + "/*.parquet", {"l_partkey": (20, 60), "l_suppkey": (2, 5)}
    )
    assert total >= 8  # the layout actually split into many files
    assert hit <= total // 2, f"{hit}/{total} files intersect the 2-D box"


def test_zorder_prunes_secondary_only_linear_cannot(layouts):
    """The qualitative advantage: a predicate on the SECONDARY column alone
    prunes files under z-order (every file's suppkey box is bounded) and
    prunes nothing under the linear layout (every file spans the full
    suppkey range)."""
    zpath, lpath = layouts
    box = {"l_suppkey": (2, 3)}
    zhit, ztotal = _files_intersecting(zpath + "/*.parquet", box)
    lhit, ltotal = _files_intersecting(lpath + "/*.parquet", box)
    assert lhit == ltotal  # linear: suppkey stats useless
    assert zhit < ztotal  # z-order: some files skip on suppkey alone


def test_zorder_tradeoff_primary_only(layouts):
    """The documented cost: the linear layout prunes a primary-only
    predicate at full resolution; z-order spends bits across dimensions so
    its primary-only pruning is coarser (but still present)."""
    zpath, lpath = layouts
    box = {"l_partkey": (20, 60)}
    zhit, ztotal = _files_intersecting(zpath + "/*.parquet", box)
    lhit, _ = _files_intersecting(lpath + "/*.parquet", box)
    assert lhit <= zhit
    assert zhit < ztotal
