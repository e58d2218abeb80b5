"""Pin bench coverage: every catalog entry is benched or named-excluded.

VERDICT r7 item 2: 59 of 199 entries were absent from the bench artifact
with no committed criterion, so their wall-time regressions were
invisible.  This test makes the bench set exhaustive-by-construction —
a new catalog entry fails the suite until it is either added to
``BENCH_QUERIES`` or given a reasoned ``BENCH_EXCLUDED`` row.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_covers_catalog_exactly():
    import bench
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )

    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDED)
    names = set(catalog.CATALOG)

    assert len(bench.BENCH_QUERIES) == len(benched), "duplicate bench entries"
    assert not (benched & excluded), f"both benched and excluded: {benched & excluded}"
    assert benched | excluded == names, (
        f"uncovered={sorted(names - benched - excluded)} "
        f"unknown={sorted((benched | excluded) - names)}"
    )


def test_exclusions_have_reasons():
    import bench

    for name, reason in bench.BENCH_EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 40, (
            f"exclusion {name!r} needs a substantive committed reason"
        )


def test_panel_members_valid():
    """Isolated drift panel (VERDICT r8 item 3): members must be real
    catalog entries, unique, and benched (a panel-only query would have
    no full-bench number to compare drift against)."""
    import bench
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )

    panel = bench.PANEL_QUERIES
    assert len(panel) == len(set(panel)), "duplicate panel entries"
    assert set(panel) <= set(catalog.CATALOG)
    assert set(panel) <= set(bench.BENCH_QUERIES)
