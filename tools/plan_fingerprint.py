"""Print normalized physical-plan fingerprints for the adjudication set.

Plan text is normalized (plan ids, exchange ids, temp view names, paths
stripped) so two code trees can be diffed: identical fingerprints mean
the code change CANNOT have altered the executed plan — any wall-time
difference is environment, not plan shape.
"""

import hashlib
import os
import re
import sys

QUERIES = [
    "dedup_minhash_lsh",
    "ann_cosine_topk_fast",
    "ann_semantic_canonical",
    "ann_semantic_canonical_fast",
    "dedup_containment_canonical",
    "ann_semantic_dedup_incremental",
    "ann_cosine_topk",
    "dedup_minhash_fast",
    "dedup_incremental",
]


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+[L]?", "#N", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=X]", plan)
    plan = re.sub(r"\[id=#?\d+\]", "[id=X]", plan)
    plan = re.sub(r"Exchange\s+\(\d+\)", "Exchange (X)", plan)
    plan = re.sub(r"\(\d+\)", "(X)", plan)
    plan = re.sub(r"file:[^\s,\]]+", "PATH", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "STATS", plan)
    return plan


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.session import (  # noqa: E501
        get_session,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        CATALOG,
    )

    spark = get_session(master="local[4]", app_name="plan-fp")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    for name in QUERIES:
        df = CATALOG[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
        norm = normalize(plan)
        with open(os.path.join(outdir, f"{name}.plan"), "w") as f:
            f.write(norm)
        print(f"{name} {hashlib.md5(norm.encode()).hexdigest()}")
    spark.stop()


if __name__ == "__main__":
    main()
