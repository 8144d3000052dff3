"""Parquet sources with column pruning."""

from .pages import read_pages, read_table

__all__ = ["read_pages", "read_table"]
