"""Render the full-surface sf1-vs-sf0.1 ratio table for SCALE.md.

Inputs: two bench.py side files (BENCH_DETAIL format) — one produced
at sf1 (SPARK_GRAFT_SF_DIR=.scale/sf1), one at the driver's sf0.1 —
both under the SAME protocol (interleaved symmetric workers, per-rep
arrays). Output: a markdown table of per-query engine/vanilla ratios
at both scales plus the drift column the round-12 verdict's rule
keys on (flag any query whose sf1 ratio degrades >30% from sf0.1),
and a JSON line of the flagged set for the diagnosis pass.

Usage: python tools/sf1_report.py <sf1_detail.json> <sf01_detail.json>
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf1 = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2]))
    r1, r0 = sf1["ratios"], sf01["ratios"]
    t1, t0 = sf1["queries"], sf01["queries"]
    names = sorted(set(r1) & set(r0))
    flagged = []
    print("| query | sf0.1 ratio | sf1 ratio | drift | sf1 engine s | flag |")
    print("|---|---|---|---|---|---|")
    for n in sorted(names, key=lambda n: r1[n] / r0[n]):
        drift = r1[n] / r0[n]
        flag = ""
        if drift < 0.7:
            flag = "DEGRADED>30%"
            flagged.append(n)
        print(
            f"| {n} | {r0[n]:.3f} | {r1[n]:.3f} | x{drift:.2f} "
            f"| {t1[n]:.2f} | {flag} |"
        )
    only1 = sorted(set(r1) - set(r0))
    only0 = sorted(set(r0) - set(r1))
    if only1 or only0:
        print(f"\nuncompared: sf1-only={only1} sf0.1-only={only0}")
    import math

    if names:  # an empty intersection (one side errored wholesale)
        gm1 = math.exp(sum(math.log(r1[n]) for n in names) / len(names))
        gm0 = math.exp(sum(math.log(r0[n]) for n in names) / len(names))
        print(f"\ngeomean over the {len(names)} common queries: "
              f"sf0.1 {gm0:.4f} -> sf1 {gm1:.4f}")
    print(json.dumps({"flagged": flagged}))


if __name__ == "__main__":
    main()
