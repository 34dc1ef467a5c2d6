"""Two-cluster-size scaling study (north_rule: N vs 4N, sandbox proxy =
local[N] threads).  Runs the headline sketch-build at several
parallelism levels, 3 trials each, printing one JSON line per trial.

    python BENCH/scaling_study.py [n_docs] [cpu_list]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import (  # noqa: E402
    _load1,
    _steal_pct,
    _steal_ticks,
    _tokseq_parquet,
    build_session,
    sketch_build_bucketed_throughput,
    sketch_build_partitioned_throughput,
    sketch_build_throughput,
    wait_for_healthy_window,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpu_list = (sys.argv[2] if len(sys.argv) > 2 else "2,8,32").split(",")
    variant = sys.argv[3] if len(sys.argv) > 3 else "corpus"
    n_trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    fn = {
        "bucketed": sketch_build_bucketed_throughput,
        "partitioned": sketch_build_partitioned_throughput,
    }.get(variant, sketch_build_throughput)
    _tokseq_parquet(n_docs)  # materialize outside timing
    import os

    # same bounded probe gate as bench.py, PER LEG: an efficiency ratio
    # across two host states is meaningless, so each leg waits (bounded)
    # for the healthy envelope before its session starts
    gate_s = (
        0.0 if os.environ.get("MARKER_BENCH_NO_WAIT") else
        float(os.environ.get("MARKER_BENCH_WINDOW_WAIT_S", "300"))
    )
    for cpus in cpu_list:
        if gate_s > 0:
            healthy, probes = wait_for_healthy_window(max_wait_s=gate_s)
            print(json.dumps({
                "cpus": int(cpus), "gate_healthy": healthy,
                "gate_probes": len(probes), "gate_last": probes[-1],
            }), flush=True)
        spark = build_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).count()  # warm JVM + python workers
        if gate_s > 0:
            # fresh OPENING bracket probe taken right here — after
            # session build + warm-up, immediately before the first
            # trial.  The gate's last probe can be minutes stale by now
            # (session spawn + JIT + first-touch all run in between),
            # which made the open side of the bracket weaker than
            # bench.py's immediately-adjacent bracketed_leg probes
            # (ADVICE r8).
            from bench import calibration_probe

            open_probe = calibration_probe()
            print(json.dumps({
                "cpus": int(cpus), "leg_open_probe": open_probe,
            }), flush=True)
        for trial in range(n_trials):
            # load BEFORE the trial: sampled after, the 1-minute average
            # is dominated by the trial's own just-finished full-load
            # run (~N on a healthy host) and can't expose the
            # degraded-idle signature (load 5+ with zero user CPU)
            load_before = _load1()
            s0 = _steal_ticks()
            secs, n_tokens, tps = fn(spark, n_docs)
            steal = _steal_pct(s0, _steal_ticks())
            print(
                json.dumps(
                    {
                        "cpus": int(cpus),
                        "trial": trial,
                        "secs": round(secs, 2),
                        "n_tokens": n_tokens,
                        "tokens_per_sec": round(tps),
                        # a timing without its steal share is unusable
                        # on this VM (BENCH/BASELINE.md §5)
                        "steal_pct": None if steal is None else round(steal, 2),
                        "load1_before": load_before,
                    }
                ),
                flush=True,
            )
        spark.stop()
        if gate_s > 0:
            # closing probe BRACKETS the leg (round-8 bench.py lesson:
            # a gate alone cannot see mid-run degradation; the r8 400k
            # certification was adjudicated by exactly this open/close
            # pair).  Health is load-exempt like bench's mid-run
            # brackets — 1-min load after our own leg is self-load.
            from bench import _mid_run_healthy, calibration_probe

            close = calibration_probe()
            print(json.dumps({
                "cpus": int(cpus),
                "leg_close_probe": close,
                "leg_bracket_healthy": bool(
                    _mid_run_healthy(open_probe) and _mid_run_healthy(close)
                ),
            }), flush=True)


if __name__ == "__main__":
    main()
