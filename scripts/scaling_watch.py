"""Quiet-window watcher for the N→4N scaling benchmark.

The sandbox VM's effective core count drifts hour-to-hour (hypervisor
steal): the same 4→16-core multiprocessing ceiling measured 1.018 at
03:20 and 0.281 at 12:06 on 2026-08-17. A raw Spark scaling number is
only meaningful in a window where the hardware itself scales, so this
watcher probes the ceiling cheaply (~30 s, engine tokenize kernel under
mp.Pool) every PROBE_SLEEP seconds and launches the full
bench_scaling.py run only when the ceiling clears CEILING_GATE. Stops
after a run passes the raw ≥0.8 contract or DEADLINE_H hours elapse.

Every full run self-appends its row to BENCH/BASELINE.md (pass or
fail), so throttled attempts stay visible in the log.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

CEILING_GATE = float(os.environ.get("WATCH_GATE", "0.85"))
PROBE_SLEEP = int(os.environ.get("WATCH_SLEEP", "480"))
DEADLINE_H = float(os.environ.get("WATCH_DEADLINE_H", "5.0"))
PAIR = os.environ.get("WATCH_PAIR", "4,16")  # N,4N — e.g. 2,8 on boots
# whose scheduler saturates past 8 runnable JVM threads (r3 findings)
SHARDS = os.environ.get("WATCH_SHARDS", "256")
# min-per-level over more repeats dodges one-sided steal bursts (the
# 23:31 run lost 0.08 efficiency to a single slow 8-core rep)
REPEATS = os.environ.get("WATCH_REPEATS", "2")
LOG = pathlib.Path("/tmp/scaling_watch.log")


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with LOG.open("a") as f:
        f.write(line + "\n")


def probe() -> float:
    from scripts.bench_scaling import mp_ceiling

    lo, hi = (int(x) for x in PAIR.split(","))
    return mp_ceiling(lo, hi, n_docs=120_000)["ceiling_eff"]


def other_spark_running() -> bool:
    """True when another local Spark JVM (tests, smoke scripts, bench)
    is alive — launching the measured run then would double-book the
    cores and produce a garbage efficiency number (observed 16:21-17:00:
    raw 0.197 while pytest ran alongside)."""
    out = subprocess.run(
        ["pgrep", "-f", "spark-submit|SparkSubmit|pyspark"],
        capture_output=True, text=True,
    )
    pids = [p for p in out.stdout.split() if p]
    return len(pids) > 0


def full_run() -> dict | None:
    proc = subprocess.run(
        [sys.executable, "scripts/bench_scaling.py", "--docs", "1200000",
         "--shards", SHARDS, "--pair", PAIR, "--repeats", REPEATS],
        cwd=REPO, capture_output=True, text=True, timeout=5400,
    )
    with open("/tmp/scaling_watch_runs.log", "a") as f:
        f.write(f"===== run @ {time.strftime('%H:%M:%S')} =====\n")
        f.write(proc.stdout + "\n")
    for ln in reversed(proc.stdout.splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    log(f"full run produced no JSON; stderr tail: {proc.stderr[-500:]}")
    return None


def main() -> None:
    deadline = time.time() + DEADLINE_H * 3600
    while time.time() < deadline:
        try:
            eff = probe()
        except Exception as exc:  # noqa: BLE001 - keep watching
            log(f"probe failed: {exc}")
            time.sleep(PROBE_SLEEP)
            continue
        log(f"ceiling probe: {eff}")
        if eff >= CEILING_GATE:
            if other_spark_running():
                log("quiet host but local spark jvm active — holding off")
                time.sleep(PROBE_SLEEP)
                continue
            log("quiet window — launching full scaling run")
            try:
                out = full_run()
            except Exception as exc:  # noqa: BLE001
                log(f"full run failed: {exc}")
                out = None
            if out:
                log(
                    f"run: raw={out['scaling_efficiency']} "
                    f"ceiling={out['mp_ceiling_same_hour']['ceiling_eff']} "
                    f"spark/ceiling={out['spark_vs_ceiling']} pass={out['pass']}"
                )
                if out["pass"]:
                    log("raw >=0.8 confirmed — watcher done")
                    return
        time.sleep(PROBE_SLEEP)
    log("deadline reached without a passing quiet-window run")


if __name__ == "__main__":
    main()
