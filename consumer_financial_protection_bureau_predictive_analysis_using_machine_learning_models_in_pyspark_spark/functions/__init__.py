"""Column-expression builders shared between Spark queries and the DuckDB
oracles (single source of truth for hash/tokenize arithmetic)."""

from . import textfns  # noqa: F401
