"""Round preflight: certify what the driver is about to check.

One command that runs, in order:
  1. the exact upcoming driver window (first 50 keys of
     driver_key_order) through the local oracle gate at sf0.01 —
     any red here becomes a driver red;
  2. the vanilla-session driver contract (entry + a spot-check that
     every queries() callable builds against a conf-less session);
  3. a bench smoke at sf0.01 with the scale probe off (~40 s).

Usage:
    python tools/preflight.py [--window 50] [--sf /root/testdata/sf0.01]

Exit code 0 = everything the driver will look at first is green.
Full-surface certification is still `python tools/check_oracle.py`
(~12 min at sf0.01); run it after oracle or operator changes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from stellarsql_spark.registry import driver_key_order

    window = driver_key_order()[: args.window]
    print(f"[1/3] oracle gate on the {len(window)}-key driver window at {args.sf}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), "--sf", args.sf, *window],
        cwd=REPO,
    )
    if r.returncode != 0:
        print("PREFLIGHT FAILED: window has reds")
        return 1

    print("[2/3] vanilla-session driver contract")
    probe = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]').getOrCreate()\n"
        "import __spark_entry__ as m\n"
        "rows = m.entry(spark).collect()\n"
        "assert rows, 'entry returned no rows'\n"
        "qs, osql = m.queries(), m.oracle_sql()\n"
        "assert set(osql) <= set(qs)\n"
        "print(f'entry rows: {len(rows)}; {len(qs)} queries, {len(osql)} oracles')\n"
    ) % REPO
    r = subprocess.run([sys.executable, "-c", probe], cwd=REPO)
    if r.returncode != 0:
        print("PREFLIGHT FAILED: driver contract broke on a vanilla session")
        return 1

    print("[3/3] bench smoke (sf0.01, probe off)")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf, SPARK_GRAFT_SCALE_PROBE="0")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO, env=env)
    if r.returncode != 0:
        print("PREFLIGHT FAILED: bench smoke")
        return 1

    print("PREFLIGHT GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
