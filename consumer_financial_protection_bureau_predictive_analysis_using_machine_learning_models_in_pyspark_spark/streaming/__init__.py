"""Event-time windowing (batch twins) and Structured Streaming jobs."""

from . import jobs, windows  # noqa: F401
