#!/usr/bin/env python3
"""Plan-shape drift gate over graft.Profile artifacts — the PROFILE.json
equivalent of Tables.assertSchemasMatch: diff a fresh per-query profile
against the committed previous round's and fail LOUDLY when a query's
execution shape regressed, instead of letting a silently-deoptimized plan
(a lost broadcast, a new exchange, a widened scan) ride into the next
round as a mystery bench regression.

Usage:
    python3 scripts/profile_drift.py <prev.json> <cur.json> [--report out.md]

Gates (per query, new/old ratio with an absolute floor so toy-scale noise
on near-zero counters never trips):
  - shuffle_read_bytes  > 1.5x and grows by > 64 KiB  (lost broadcast /
    new exchange — the round-10 verdict's headline check)
  - input_bytes         > 1.5x and grows by > 1 MiB   (lost pruning/pushdown)
  - jobs                > 2x   and grows by > 2       (driver-side loop crept in)
  - spilled_bytes       newly nonzero above 16 MiB    (partition sizing broke)
Queries present on only one side are reported (inventory change) but only
DISAPPEARED queries fail the gate. wall/cpu are intentionally NOT gated —
this box's +/-50% background load makes time a useless drift signal; shape
counters are load-invariant.

Exit 0 = no drift; exit 1 = drift (printed, and written to --report).
"""
import json
import sys


GATES = [
    # (field, ratio_limit, absolute_growth_floor)
    ("shuffle_read_bytes", 1.5, 64 * 1024),
    ("input_bytes", 1.5, 1024 * 1024),
    ("jobs", 2.0, 2),
]
SPILL_FLOOR = 16 * 1024 * 1024


def load(path):
    with open(path) as f:
        return {p["name"]: p for p in json.load(f)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    report_path = None
    if "--report" in sys.argv:
        report_path = sys.argv[sys.argv.index("--report") + 1]
        args = [a for a in args if a != report_path]
    if len(args) != 2:
        sys.exit(__doc__)
    prev, cur = load(args[0]), load(args[1])

    lines, failures = [], []
    gone = sorted(set(prev) - set(cur))
    new = sorted(set(cur) - set(prev))
    for n in gone:
        failures.append(f"{n}: DISAPPEARED from the current profile")
    for n in new:
        lines.append(f"{n}: new this round (no baseline) — "
                     f"shuffle {cur[n]['shuffle_read_bytes']}B, "
                     f"jobs {cur[n]['jobs']}")
    for n in sorted(set(prev) & set(cur)):
        p, c = prev[n], cur[n]
        for field, ratio, floor in GATES:
            old, newv = p[field], c[field]
            if newv > old * ratio and newv - old > floor:
                failures.append(
                    f"{n}: {field} {old} -> {newv} "
                    f"({newv / max(old, 1):.2f}x, +{newv - old})")
        if p["spilled_bytes"] == 0 and c["spilled_bytes"] > SPILL_FLOOR:
            failures.append(
                f"{n}: newly spilling {c['spilled_bytes']} bytes")

    header = (f"profile drift {args[0]} -> {args[1]}: "
              f"{len(failures)} drift(s), {len(new)} new, {len(gone)} gone, "
              f"{len(set(prev) & set(cur))} compared")
    out = [header] + [f"DRIFT {f}" for f in failures] + lines
    print("\n".join(out))
    if report_path:
        with open(report_path, "w") as f:
            f.write("# Plan-shape drift report\n\n")
            f.write("\n".join(f"- {o}" for o in out) + "\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
