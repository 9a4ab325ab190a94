from .rows import build_rows_for_file, WIDE_COLUMNS

__all__ = ["build_rows_for_file", "WIDE_COLUMNS"]
