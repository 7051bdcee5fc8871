"""Compare two bench_full.json records and flag per-query drift.

The driver's BENCH_r{N}.json tail truncates (~74 of the per-query
timings survive), so round-over-round comparison runs on the repo's own
bench_full.json (written by bench.py on every run).  The operative
perf bar (BASELINE.md) is "within 2x"; BASELINE.md also documents 1.9x
same-day machine variance on identical code, so anything this script
flags is a RE-MEASURE candidate (median-of-3 in a quiet session), not
automatically a regression.

Usage: python scripts/compare_bench.py OLD.json NEW.json [threshold]
Exit code 1 if any query exceeds the threshold (default 2.0), so it
can gate CI-style checks.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qo, qn = old.get("queries", old), new.get("queries", new)
    flagged, missing = [], []
    for name, t_new in sorted(qn.items()):
        t_old = qo.get(name)
        if t_old is None:
            missing.append(name)
            continue
        # sub-100ms timings are all fixed overhead; ratios there are noise
        if t_old >= 0.1 and t_new / t_old > thr:
            flagged.append((t_new / t_old, name, t_old, t_new))
    for r, name, a, b in sorted(flagged, reverse=True):
        print(f"DRIFT {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    for name in missing:
        print(f"NEW   {name}: {qn[name]:.2f}s (no prior record)")
    gone = sorted(set(qo) - set(qn))
    for name in gone:
        print(f"GONE  {name} (present in old record only)")
    print(
        f"compared {len(qn) - len(missing)} queries vs baseline: "
        f"{len(flagged)} over {thr}x, {len(missing)} new, {len(gone)} removed"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
