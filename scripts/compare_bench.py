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


def load_queries(path: str) -> dict[str, float]:
    """Return {query: seconds} from any bench record shape.

    Accepts (a) bench_full.json / bench.py stdout ({"queries": {...}}),
    (b) a bare {query: sec} map, and (c) the driver's BENCH_r{N}.json
    wrapper ({"tail": "...", "parsed": ...}) — using "parsed" when the
    driver managed to parse, else salvaging complete `"name": 1.23`
    pairs out of the truncated tail string.  Non-numeric values are
    dropped so a wrapper's metadata keys never reach the ratio math.
    """
    d = json.load(open(path))
    if isinstance(d, dict) and "tail" in d and "queries" not in d:
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            d = parsed
        else:
            import re as _re

            tail = d.get("tail") or ""
            d = {
                m.group(1): float(m.group(2))
                for m in _re.finditer(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)[,}]', tail)
            }
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        d = d["queries"]
    return {k: float(v) for k, v in d.items() if isinstance(v, (int, float))}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qo, qn = old, new
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
