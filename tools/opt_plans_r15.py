"""Capture .explain("formatted") snapshots for optimization round 15.

Writes plans/r15/<key>_<tag>.txt for each requested registry key,
compiled under the bench's base-tier conditions (tables cached,
tune_for_data_size at the target SF) so the snapshot matches what the
driver's bench session plans.  Pass --sf pointing at a scaled corpus
(and --no-cache) to snapshot a deep tier's plan instead (AQE on,
bytes/128 MiB partitions — the shape the 300x/1000x rows run).

    python tools/opt_plans_r15.py --tag before [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

DEFAULT_KEYS = [
    # the 10 driver headline queries
    "b_agg_groupby",
    "b_join_inner",
    "b_topk_per_group",
    "b_stream_tumbling",
    "b_llm_cosine_topk",
    "b_llm_dedup_exact",
    "b_win_running_sum",
    "b_join_asof",
    "b_tpch_q3",
    "b_ev_funnel",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip df.cache() (deep-tier protocol)")
    ap.add_argument("--suffix", default="",
                    help="extra suffix before the tag (e.g. _x1000)")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from stellarsql_spark.catalog import TABLES, load_table
    from stellarsql_spark.plans.explain import physical_plan
    from stellarsql_spark.registry import all_specs
    from stellarsql_spark.session import get_spark, tune_for_data_size

    spark = get_spark("opt_plans_r15", cpus=32)
    tune_for_data_size(spark, args.sf, cpus=32)
    if not args.no_cache:
        for t in TABLES:
            df = load_table(spark, args.sf, t)
            df.cache()
            df.count()

    specs = all_specs()
    out_dir = os.path.join("/root/repo", "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for key in args.keys or DEFAULT_KEYS:
        spec = specs[key]
        df = spec.builder(spark, args.sf)
        plan = physical_plan(df)
        path = os.path.join(out_dir, f"{key}{args.suffix}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
