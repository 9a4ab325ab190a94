from .discover import discover_files, expand_glob, fetch_remote
from .hcl_datasource import HclDataSource, register_hcl_datasource

__all__ = [
    "discover_files",
    "expand_glob",
    "fetch_remote",
    "HclDataSource",
    "register_hcl_datasource",
]
