#!/usr/bin/env python3
"""Re-stamp .bench/large_cert_history.tsv so the driver's recorded run
targets the round-8 skip set first.

The round-8 RECORDED bench artifact (BENCH_r08.json) certified a known
subset of queries at the sf1-class tier: all of q30..q99, q52/q53,
q209, and q304-q306 (per VERDICT.md round 8). History entries seeded
from an in-session dry run get stamped one run OLDER than the
known-r8-recorded names, so Bench.largeOrder runs the complement —
i.e. the r8 recorded run's skip list — first, and the union of
recorded rounds converges on full coverage.

Run-id conventions this tool respects:
  - run 0 is the "never certified, run FIRST" seed for brand-new
    queries (names added after the r8 seeding, e.g. q307-q309 in
    round 9 — seeded at 0 by hand so they lead the next recorded
    pass). This tool cannot produce run-0 rows; it PRESERVES them.
  - names outside the hard-coded r8 set whose existing run id is
    neither 1 nor 2 keep their id unchanged (idempotence over files
    the driver has since re-stamped: a recorded run id must never be
    demoted back into the seeded range).
  - '#'-prefixed lines are comments (provenance notes); they are
    dropped here because Bench.writeHistory re-emits the canonical
    provenance block on its next write.

Usage: python3 tools/stamp_history.py [path-to-tsv]
Idempotent: re-running produces the identical file.
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
            if len(parts) == 3 and not parts[0].startswith("#"):
                entries[parts[0]] = (float(parts[1]), int(parts[2]))
    # the header must stay >= every stamp in the file, or the next
    # recorded run's id (header + 1) collides with a preserved stamp
    head = max([2] + [r for _, r in entries.values() if r not in (1, 2)])
    with open(path, "w") as f:
        f.write(f"#run\t{head}\n")
        for name in sorted(entries):
            secs, old_run = entries[name]
            if old_run not in (1, 2):
                # preserve run-0 seeds and already-recorded stamps for
                # EVERY name — an r8-set name whose stamp has since been
                # recorded must not be demoted back into the seeded range
                run = old_run
            elif r8_recorded(name):
                run = 2
            else:
                run = 1
            f.write(f"{name}\t{secs}\t{run}\n")
    kept = sum(1 for _, (_, r) in entries.items() if r not in (1, 2))
    n2 = sum(1 for n, (_, r) in entries.items()
             if r in (1, 2) and r8_recorded(n))
    print(f"stamped {len(entries)} entries: {n2} at run 2 (r8-recorded), "
          f"{len(entries) - n2 - kept} at run 1 (r8 skips, run first), "
          f"{kept} preserved (run-0 seeds / recorded stamps)")


if __name__ == "__main__":
    main()
