"""Strict sf1 value-parity soak for NAMED entries (out-of-rotation).

``scale_soak.run`` ranks candidates by the newest BENCH_LOCAL timings, so
an entry registered after the round's full bench has no row to rank by
and would be skipped; this runs the identical compare for entries given
on the command line and MERGES the rows into /tmp/soak_results.json (the
file a round's SOAK_SF1_r{N}.json is committed from).

Usage: python tools/soak_one.py <entry> [<entry> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from tools.scale_soak import OUT, RESULTS  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    from oracle_harness import compare, duck_connection

    import __spark_entry__ as E

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
    os.makedirs("/tmp/duckspill", exist_ok=True)
    con.execute("PRAGMA temp_directory='/tmp/duckspill'")
    done: dict = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            done = json.load(fh)
    fails = 0
    for name in sys.argv[1:]:
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
    spark.stop()
    print("fails:", fails)
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
