"""Run the full driver-replica parity sweep at sf0.01 (what t2 does).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psvm_spark import registry
from psvm_spark.oracle import compare_all, compare_query, duckdb_connection
from psvm_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = get_spark("parity_check")
    registry.load_all()
    if names:
        con = duckdb_connection(sf_dir)
        results = [compare_query(spark, sf_dir, n, con) for n in names]
        con.close()
    else:
        results = compare_all(spark, sf_dir)
    bad = 0
    for r in results:
        print(r)
        bad += 0 if r.ok else 1
    print(f"\n{len(results) - bad}/{len(results)} parity-exact at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
