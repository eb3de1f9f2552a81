"""Calm-gated ledger bench runner.

The sandbox host carries external tenant load (hypervisor steal +
DRAM-bandwidth contention) with multi-hour weather. The per-query
protocol inside bench.py is already best-of-N interleaved, but a whole
suite run under a bad-weather window is uniformly slow and useless for
the round ledger. This runner applies the same double gate the scaling
sweeps use (pre-run 1-min loadavg + memcpy-bandwidth probe) to the
SUITE: wait for a calm window, run `python bench.py`, then accept the
result only if the run's own per-leg telemetry stayed calm — otherwise
wait and retry.

Acceptance (post-hoc, from the suite's recorded telemetry):
  - best crawl_bench rep's steal delta <= STEAL_MAX cpu-s
  - every query-pass membw probe >= MEMBW_MIN * 0.9
Accepted output is copied to BENCH/bench_r5_final.json; every attempt
log is kept (bench_r5_attempt<N>.log).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (probe helpers)

LOAD_MAX = float(os.environ.get("CALM_BENCH_LOAD_MAX", "1.5"))
MEMBW_MIN = float(os.environ.get("CALM_BENCH_MEMBW_MIN", "6200"))
STEAL_MAX = float(os.environ.get("CALM_BENCH_STEAL_MAX", "25"))
# defaults: pre-run 1-min loadavg gate; MB/s pre-run gate (r4 ledger
# ran at 6.4-7.4 GB/s); cpu-s charged during the BEST crawl rep.
# Env-overridable so a round can hunt a stricter window when the host
# sits on a low-bandwidth plateau (round 6: multi-hour ~5.5 GB/s
# plateaus between 10-12 GB/s windows).
MAX_ATTEMPTS = int(os.environ.get("CALM_BENCH_ATTEMPTS", "4"))
BUDGET_S = float(os.environ.get("CALM_BENCH_BUDGET_S", "10800"))
BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
# round label: names the accepted-output file and the attempt logs so
# later rounds don't overwrite earlier ledgers
TAG = os.environ.get("CALM_BENCH_TAG", "r5")


def wait_calm(deadline: float) -> bool:
    while time.monotonic() < deadline:
        load = bench._load_probe()
        bw = bench._membw_probe()
        print(f"[gate] loadavg={load:.2f} membw={bw:.0f}", flush=True)
        if load <= LOAD_MAX and bw >= MEMBW_MIN:
            return True
        time.sleep(60)
    return False


def accepted(doc: dict) -> tuple[bool, str]:
    raw = doc["raw_sec"]["crawl_bench"]
    steals = doc["steal_cpu_s"]["crawl_bench"]
    best_i = min(range(len(raw)), key=lambda i: raw[i])
    if steals[best_i] > STEAL_MAX:
        return False, f"best crawl rep steal {steals[best_i]} > {STEAL_MAX}"
    bad_bw = [b for b in doc["membw_mb_s_pre"]["query_pass"] if b < MEMBW_MIN * 0.9]
    if bad_bw:
        return False, f"query-pass membw dips {bad_bw}"
    return True, "calm"


def main() -> None:
    deadline = time.monotonic() + BUDGET_S
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if not wait_calm(deadline):
            print("[gate] budget exhausted waiting for calm", flush=True)
            break
        log = os.path.join(BENCH_DIR, f"bench_{TAG}_attempt{attempt}.log")
        print(f"[run] attempt {attempt} -> {log}", flush=True)
        env = dict(os.environ, ATRA_BENCH_CRAWL_REPS="3")
        with open(log, "w") as fh:
            subprocess.run([sys.executable, "bench.py"], stdout=fh,
                           stderr=subprocess.STDOUT, env=env, check=False)
        lines = [l for l in open(log) if l.lstrip().startswith('{"metric"')]
        if not lines:
            print("[run] no JSON produced; retrying", flush=True)
            continue
        doc = json.loads(lines[-1])
        ok, why = accepted(doc)
        print(f"[run] attempt {attempt}: {why}; suite={doc['value']}", flush=True)
        if ok:
            out = os.path.join(BENCH_DIR, f"bench_{TAG}_final.json")
            with open(out, "w") as fh:
                json.dump(doc, fh, indent=1)
            print(f"[done] accepted -> {out}", flush=True)
            return
    print("[done] no accepted run; keep best attempt manually", flush=True)


if __name__ == "__main__":
    main()
