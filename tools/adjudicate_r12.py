"""Round-12 adjudication of the 7 panel-reproduced r11 regressions.

VERDICT r11 "Next round" item 1: run the reproduced members in a fresh
isolated session on an IDLE box (round start, nothing else running) and
compare medians directly against their r10 full-bench medians.  A member
back <= 1.3x its r10 median is CLEARED (the r11 panel ran concurrent with
the round-close SF1 wall + soak window); anything still above 1.3x is a
REAL regression to root-cause in the r11 diffs to eng/operators/dedup.py,
eng/operators/similarity.py, eng/functions/hashing.py.

Writes tools/ADJUDICATE_r12.json and prints one JSON line.
"""

import json
import os
import sys
import time

MEMBERS = [
    "ann_semantic_canonical",
    "ann_semantic_canonical_fast",
    "dedup_containment_canonical",
    "ann_semantic_dedup_incremental",
    "ann_cosine_topk",
    "dedup_minhash_fast",
    "dedup_incremental",
]

R10_FULL = {
    "ann_semantic_canonical": 3.156,
    "ann_semantic_canonical_fast": 1.408,
    "dedup_containment_canonical": 2.639,
    "ann_semantic_dedup_incremental": 3.342,
    "ann_cosine_topk": 1.420,
    "dedup_minhash_fast": 1.894,
    "dedup_incremental": 0.367,
}


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

    spark = get_session(master=f"local[{cpus}]", app_name="adjudicate-r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prime_session(spark, sf_dir, cpus)

    out = {}
    for name in MEMBERS:
        spec = CATALOG[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[1]
        ratio = round(med / R10_FULL[name], 3)
        out[name] = {
            "runs": runs,
            "median": med,
            "r10_full": R10_FULL[name],
            "ratio_vs_r10": ratio,
            "verdict": "cleared" if ratio <= 1.3 else "reproduced",
        }
        print(
            f"# {name}: median {med:.3f}s vs r10 {R10_FULL[name]:.3f}s"
            f" ratio {ratio} -> {out[name]['verdict']}",
            file=sys.stderr,
        )
    spark.stop()

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ADJUDICATE_r12.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
