"""Generate ``__spark_entry__._PRIORITY`` from the CORRECTNESS artifacts.

The driver's correctness run covers only the first 50 ``queries()``
entries, so the catalog must be emitted in a rotation order that
guarantees every entry keeps getting fresh driver rows.  VERDICT r7
flagged that hand-editing the window let three entries go never-checked
and eight go stale at r1-vintage; this script makes the policy
mechanical:

1. **Never-checked entries first** — any catalog entry with no row in
   any committed ``CORRECTNESS_r*.json`` (this is automatically where
   brand-new registrations land), in catalog registration order.
2. **Then everything else oldest-first** — ordered by the round of the
   entry's newest driver row (ascending), ties broken by catalog
   registration order.

The FULL catalog is emitted in this order (not just the 50-entry
window), so the overflow tail is also staleness-ordered and the next
round's window is simply the next-oldest block.

``tests/test_priority_window.py`` asserts the committed ``_PRIORITY``
list matches this generator's output, so the window can no longer
drift from the policy by hand-editing.

Usage::

    python tools/gen_priority.py           # print the list source
    python tools/gen_priority.py --check   # exit 1 if committed != generated
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # driver correctness coverage (observed r1: first 50 entries)


def latest_rounds(repo: str = REPO, max_round: int | None = None) -> dict[str, int]:
    """Map entry name -> round of its newest driver row (any status).

    ``max_round`` ignores artifacts from rounds above it — used by the
    drift test to reconstruct the generator's view *before* the driver
    wrote the current round's artifact (the committed window is always
    generated at round open, one artifact behind the post-round tree).
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        match = re.search(r"r(\d+)\.json$", path)
        if not match:
            continue
        rnd = int(match.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def max_artifact_round(repo: str = REPO) -> int:
    """Highest round number among committed CORRECTNESS artifacts."""
    rounds = [
        int(m.group(1))
        for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)\.json$", path))
    ]
    return max(rounds, default=0)


def generate(repo: str = REPO, max_round: int | None = None) -> list[str]:
    """Full catalog emission order per the rotation policy above."""
    sys.path.insert(0, repo)
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )

    names = list(catalog.CATALOG)
    order = {name: idx for idx, name in enumerate(names)}
    latest = latest_rounds(repo, max_round=max_round)
    never = [n for n in names if n not in latest]
    seen = sorted((n for n in names if n in latest), key=lambda n: (latest[n], order[n]))
    return never + seen


def render(repo: str = REPO) -> str:
    latest = latest_rounds(repo)
    lines = ["_PRIORITY = ["]
    for idx, name in enumerate(generate(repo)):
        note = (
            "never checked — first driver row"
            if name not in latest
            else f"newest driver row r{latest[name]}"
        )
        if idx == WINDOW:
            lines.append("    # ---- window boundary (50): overflow is staleness-ordered ----")
        lines.append(f'    "{name}",  # {note}')
    lines.append("]")
    return "\n".join(lines)


def main() -> int:
    if "--check" in sys.argv:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entry

        want = generate()
        got = list(entry._PRIORITY)
        if got != want:
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"first divergence at index {i}: committed={g!r} generated={w!r}")
                    break
            else:
                print(f"length mismatch: committed={len(got)} generated={len(want)}")
            return 1
        print(f"OK: committed window matches generator ({len(want)} entries)")
        return 0
    print(render())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
