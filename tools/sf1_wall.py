"""Whole-catalog one-decade wall budget (r10, VERDICT r9 item 8).

`tools/sf1_bench.py` measures a representative panel at sf0.1 AND sf1;
this tool extends decade-scaling evidence to the FULL benched catalog:
every `bench.py BENCH_QUERIES` entry runs ONCE on the ~sf1 soak corpus
(10 key-shifted copies of sf0.1, `tools/scale_soak.py build`) in one
warmed session, and the per-query walls are committed next to the
newest `BENCH_LOCAL_r{N}.json` so the sf0.1→sf1 ratio is computable for
every entry, not a panel.

Single-run walls (not best-of-2): the goal is a full-catalog BUDGET and
superlinear-tail detection, not a steady-state microbenchmark — the
panel (sf1_bench) remains the precision instrument.  Streaming entries
keep their fixed lifecycle cost; their ratios read low by construction.

Usage: python tools/sf1_wall.py          (writes SF1_WALL_r{N}.json)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF1 = "/tmp/sfsoak"


def _round_number() -> int:
    nums = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(HERE, "BENCH_r*.json"))
    ]
    return (max(nums) + 1) if nums else 1


def _latest_local() -> dict[str, float]:
    paths = sorted(
        glob.glob(os.path.join(HERE, "BENCH_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(paths[-1]) as fh:
        return json.load(fh)["queries"]


def main() -> None:
    from bench import BENCH_QUERIES

    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans.catalog import (  # noqa: E501
        CATALOG,
    )
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.session import (  # noqa: E501
        get_session,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_session(master=f"local[{cpus}]", app_name="sf1-wall")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF1, "lineitem.parquet")).count()
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    sf01 = _latest_local()
    walls: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_total = time.perf_counter()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        try:
            CATALOG[name].fn(spark, SF1).count()
            walls[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
        print(
            f"# {name}: {walls.get(name, 'ERROR')}s",
            file=sys.stderr, flush=True,
        )
    total = round(time.perf_counter() - t_total, 1)
    spark.stop()

    ratios = {
        n: round(walls[n] / sf01[n], 2)
        for n in walls
        if n in sf01 and sf01[n] > 0
    }
    r_sorted = sorted(ratios.values())
    payload = {
        "note": (
            "single-run sf1 (10x soak corpus) wall per benched catalog "
            "entry, one warmed session; ratio = sf1 wall / newest "
            "committed BENCH_LOCAL sf0.1 wall (different sessions -- "
            "budget/tail detector, not a steady-state microbenchmark)"
        ),
        "cpus": cpus,
        "total_sec": total,
        "n_queries": len(walls),
        "median_ratio": r_sorted[len(r_sorted) // 2] if r_sorted else None,
        "p90_ratio": r_sorted[int(len(r_sorted) * 0.9)] if r_sorted else None,
        "top10_ratio": dict(
            sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
        ),
        "errors": errors,
        "queries": walls,
        "ratio_vs_sf0_1": ratios,
    }
    path = os.path.join(HERE, f"SF1_WALL_r{_round_number():02d}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"sf1_wall": path, "total_sec": total,
                      "n": len(walls), "errors": len(errors)}))


if __name__ == "__main__":
    main()
