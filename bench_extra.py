"""Isolated per-query probes for the optimization rounds.

bench.py is FROZEN for measurement, so all extra instrumentation lives
here: time a named subset of the declared queries with the same
methodology (same session config, df.collect(), min-of-N trials,
release_all between trials), optionally with the noop sink instead of
collect, and optionally dump explain("formatted") to a file (elided
past --plan-lines lines, the round-9 lesson on iterative plans).

    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries embedding_near_dup_lsh,winnowing_dups --trials 2 \
        [--noop] [--plan-dir plans/r11 --plan-suffix _before]

Prints one JSON line per query:
    {"query": ..., "sf_dir": ..., "mode": ..., "secs": [..], "best": ..}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_session  # same session config as the frozen bench


def _elide(text: str, cap: int) -> str:
    lines = text.splitlines()
    if len(lines) <= cap:
        return text
    kept = lines[:cap]
    kept.append(f"... [{len(lines) - cap} more lines elided]")
    return "\n".join(kept)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names, or 'all'")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of collect()")
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--plan-lines", type=int, default=150)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = build_session(args.cpus)
    import __spark_entry__ as entrymod
    from marker_spark.cacheutil import release_all

    qmap = entrymod.queries()
    names = list(qmap) if args.queries == "all" else args.queries.split(",")

    for name in names:
        fn = qmap[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan_dir, f"{name}{args.plan_suffix}.txt"), "w") as f:
                f.write(_elide(plan, args.plan_lines) + "\n")
            release_all()
        secs = []
        if args.trials == 0:
            print(json.dumps({"query": name, "plan_only": True}), flush=True)
            continue
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            secs.append(round(time.monotonic() - t0, 3))
            release_all()
        print(json.dumps({
            "query": name, "sf_dir": args.sf_dir,
            "mode": "noop" if args.noop else "collect",
            "secs": secs, "best": min(secs),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
