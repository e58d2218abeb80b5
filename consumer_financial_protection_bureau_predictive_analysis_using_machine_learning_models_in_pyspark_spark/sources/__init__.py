"""Sources and sinks (SURVEY §2.1)."""

from . import fixtures, readers, sinks  # noqa: F401
