"""Run ONE catalog query in a fresh primed session, 3 runs, print median.

Usage: python tools/isolate_one.py <query_name> [<query_name> ...]
Each named query gets its OWN SparkSession (stopped between queries), so
no cross-query persist/cache contamination — the per-query isolation arm
of the r12 regression adjudication.
"""

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.session import (  # noqa: E501
        get_session,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        CATALOG,
    )
    import bench

    out = {}
    for name in sys.argv[1:]:
        spark = get_session(master=f"local[{cpus}]", app_name=f"iso-{name}")
        spark.sparkContext.setLogLevel("ERROR")
        bench._prime_session(spark, sf_dir, cpus)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.stop()
        out[name] = {"runs": runs, "median": sorted(runs)[1]}
        print(f"# iso {name}: median {out[name]['median']:.3f}s {runs}", file=sys.stderr)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
