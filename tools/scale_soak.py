"""One-decade scale soak (VERDICT r7 item 6).

Builds an ~sf1 corpus by unioning N key-shifted copies of the sf0.1
tables (key strides = per-key max+1, so every copy's join relationships
stay internally consistent and copies never collide), then re-runs the
strict DuckDB parity comparison for the heaviest oracled catalog
entries at that scale.

The sf0.1 sweep (r7) caught a DuckDB decimal-width overflow one decade
above the driver's sf0.01 gate; this pushes the same class of
width/margin bugs one more decade before they can reach a real run.

Usage:
    python tools/scale_soak.py build [N_COPIES]      # writes /tmp/sfsoak
    python tools/scale_soak.py run  [K_HEAVIEST]     # parity-sweep top-K
    python tools/scale_soak.py all  [N_COPIES] [K]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sfsoak"

# table -> columns shifted by copy_index * (max(col over ALL its roles)+1).
# Strides are shared per KEY FAMILY (e.g. orderkey in orders AND lineitem)
# so foreign keys stay consistent within each copy.
KEY_FAMILIES = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
# dimension tables copied once, never scaled
DIMS = ["region", "nation"]
FACTS = ["customer", "supplier", "part", "orders", "lineitem", "events",
         "documents", "embeddings"]


def build(n_copies: int = 10) -> None:
    import duckdb

    con = duckdb.connect()
    os.makedirs(OUT, exist_ok=True)
    strides: dict[tuple[str, str], int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for table, col in cols:
            (m,) = con.execute(
                f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()
            mx = max(mx, int(m))
        for table, col in cols:
            strides[(table, col)] = mx + 1

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"copied dim {t}")

    for t in FACTS:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for k in range(n_copies):
            proj = ", ".join(
                f"({c} + {k * strides[(t, c)]}) AS {c}" if (t, c) in strides else c
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()
        print(f"scaled {t}: {n} rows ({n_copies} copies)")


# Entries excluded from the sf1 soak with committed reasons.  The soak
# hunts width/margin breaks in ORACLED VALUE SURFACES; an entry whose
# DuckDB oracle is wall-clock-superlinear at sf1 burns the soak budget
# without adding width coverage (the ENGINE side of these is plan-audited
# and bench-covered separately).
SOAK_SKIP = {
    "supplier_copurchase_pagerank": (
        "oracle-side unrolled 3-iteration pagerank re-evaluates the"
        " co-occurrence self-join per iteration in DuckDB: minutes at"
        " sf0.1, >10 min at sf1 (measured r8: one 590 s soak chunk died"
        " inside it without completing)"
    ),
    "supplier_strong_components": (
        "oracle-side recursive-CTE transitive closure over the 10x"
        " supplier co-purchase graph: >430 s at sf1 without completing"
        " (measured r8) — same superlinear-oracle class as pagerank"
    ),
    "dedup_edit_distance": (
        "the 10x key-shifted soak corpus gives every doc 9 exact clones,"
        " so each prefix block is 10x denser (~100x candidate pairs) and"
        " DuckDB's per-pair levenshtein went >900 s at sf1 without"
        " completing (measured r9); the ENGINE side finishes the same"
        " corpus in 298.5 s / 414,491 verified pairs (measured r9) — the"
        " skip is the oracle's O(len^2)-per-pair scalar loop, not the"
        " capped blocking"
    ),
}


def already_soaked() -> set[str]:
    """Names with a committed sf1 soak row in ANY prior round's
    SOAK_SF1_r*.json — the cumulative rotation ledger (SURVEY §5): each
    round soaks the next-heaviest K entries that have never had an sf1
    row, so every oracled entry gets one within a few rounds."""
    seen: set[str] = set()
    for p in glob.glob(os.path.join(REPO, "SOAK_SF1_r*.json")):
        with open(p) as fh:
            seen.update(json.load(fh))
    return seen


def heaviest_oracled(k: int, rotate: bool = True) -> list[str]:
    """Top-k oracled entries by the newest committed BENCH_LOCAL timings
    (SOAK_SKIP entries replaced by the next-heaviest; with ``rotate``,
    entries already covered by a committed soak ledger are skipped so the
    window advances each round)."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
        catalog,
    )

    paths = sorted(
        glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(paths[-1]) as fh:
        timings = json.load(fh)["queries"]
    covered = already_soaked() if rotate else set()
    oracled = [
        (sec, name)
        for name, sec in timings.items()
        if name in catalog.CATALOG
        and catalog.CATALOG[name].oracle is not None
        and name not in SOAK_SKIP
        and name not in covered
    ]
    return [name for _, name in sorted(oracled, reverse=True)[:k]]


RESULTS = "/tmp/soak_results.json"


def run(k: int = 20, resume: bool = False) -> int:
    from pyspark.sql import SparkSession

    from oracle_harness import compare, duck_connection

    import __spark_entry__ as E

    names = heaviest_oracled(k)
    done: dict[str, dict] = {}
    if resume and os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            done = json.load(fh)
        names = [n for n in names if n not in done]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = E.queries(), E.oracle_sql()
    con = duck_connection(OUT)
    # big closures spill: keep DuckDB's temp out of the repo cwd (a 17 GB
    # .tmp/ appeared under /root/repo during the strong-components soak)
    os.makedirs("/tmp/duckspill", exist_ok=True)
    con.execute("PRAGMA temp_directory='/tmp/duckspill'")
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare(qs[name](spark, OUT), con, osql[name])
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(e).__name__}: {str(e)[:200]}"
        dt = time.time() - t0
        print(("PASS" if ok else f"FAIL {msg}"), name, f"{dt:.1f}s", flush=True)
        done[name] = {"ok": ok, "msg": None if ok else msg, "sec": round(dt, 1)}
        with open(RESULTS, "w") as fh:
            json.dump(done, fh, indent=1)
        fails += not ok
    print("fails:", fails)
    spark.stop()
    return fails


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    elif mode == "run":
        raise SystemExit(run(int(sys.argv[2]) if len(sys.argv) > 2 else 20))
    elif mode == "resume":
        raise SystemExit(
            run(int(sys.argv[2]) if len(sys.argv) > 2 else 20, resume=True)
        )
    else:
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        raise SystemExit(run(int(sys.argv[3]) if len(sys.argv) > 3 else 20))
