"""ML pipelines (SURVEY §2.9): parameterized builders, tuning, evaluation,
and the UDF-free NLP/LDA path."""

from . import nlp, pipelines  # noqa: F401
