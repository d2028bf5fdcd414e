#!/usr/bin/env python3
"""Round-over-round ideal32 drift check (round-16 VERDICT task #4).

ideal32 (executor task-seconds / 32) is the load-invariant per-query
anchor Bench records next to wall; wall drifts +-25-40% with host load,
so performance claims move only when ideal32 moves. This script closes
the loop: before ACCEPTING a new bench run as the committed pair,
compare its per-query ideal32 (batch queries AND lake scenarios) against
the committed bench/BENCH_PAIR.json and print every regression > 20% as
a named list — so "which queries regressed" stops being tail-reading
archaeology.

Noise guards: queries whose ideal32 is under MIN_WORK_S (0.02 s) on BOTH
sides are pure driver/JIT floor — their task time is milliseconds and a
2x swing is scheduler timing, not work; deltas under MIN_DELTA_S
(0.01 s) are likewise ignored.

Usage:
  python3 scripts/ideal32_drift.py                       # LATEST vs PAIR
  python3 scripts/ideal32_drift.py new.json [base.json]  # explicit files

Writes bench/IDEAL32_DRIFT.json (commit it WITH the accepted pair) and
exits 0 always — drift is a report to adjudicate, not a gate: a genuine
regression should be fixed or explained in BASELINE.md, a justified one
(query re-keyed, fixture changed) documented in the commit.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_WORK_S = 0.02
MIN_DELTA_S = 0.01
THRESHOLD = 0.20


def load(p):
    with open(p) as f:
        return json.load(f)


def drift(new, base, key):
    nm, bm = new.get(key) or {}, base.get(key) or {}
    out = []
    for q in sorted(set(nm) & set(bm)):
        n, b = float(nm[q]), float(bm[q])
        if max(n, b) < MIN_WORK_S or n - b < MIN_DELTA_S:
            continue
        if b > 0 and (n - b) / b > THRESHOLD:
            out.append({"query": q, "leg": key, "base_s": round(b, 3),
                        "new_s": round(n, 3),
                        "pct": round(100.0 * (n - b) / b, 1)})
    return out


def main():
    new_p = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "bench", "BENCH_LATEST.json")
    base_p = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(ROOT, "bench", "BENCH_PAIR.json")
    new, base = load(new_p), load(base_p)
    regs = drift(new, base, "ideal32") + drift(new, base, "lake_ideal32")
    regs.sort(key=lambda r: -r["pct"])
    report = {
        "new": os.path.relpath(new_p, ROOT),
        "base": os.path.relpath(base_p, ROOT),
        "threshold_pct": int(THRESHOLD * 100),
        "min_work_s": MIN_WORK_S,
        "regressions": regs,
    }
    out = os.path.join(ROOT, "bench", "IDEAL32_DRIFT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    if regs:
        print("ideal32 regressions > %d%% vs %s:" %
              (int(THRESHOLD * 100), report["base"]))
        for r in regs:
            print("  %-28s %s  %.3f -> %.3f s  (+%.1f%%)" %
                  (r["query"], r["leg"], r["base_s"], r["new_s"], r["pct"]))
    else:
        print("no ideal32 regression > %d%% (noise floor %.0f ms)" %
              (int(THRESHOLD * 100), MIN_WORK_S * 1000))
    print("wrote", os.path.relpath(out, ROOT))


if __name__ == "__main__":
    main()
