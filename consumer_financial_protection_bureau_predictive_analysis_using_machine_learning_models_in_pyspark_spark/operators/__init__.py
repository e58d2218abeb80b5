"""Operator library — the engine's verbs, each a named, parameterized,
tested function over DataFrames (SURVEY §2's inventory re-expressed)."""

from . import (  # noqa: F401
    cleaning,
    dedup,
    encode,
    metrics,
    multimodal,
    sampling,
    similarity,
    skew,
    text,
    windows,
)
