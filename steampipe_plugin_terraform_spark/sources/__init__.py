from .discover import discover_files, expand_glob, fetch_remote

__all__ = ["discover_files", "expand_glob", "fetch_remote"]
