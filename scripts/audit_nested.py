"""Flag oracled queries whose output schema contains nested types.

The driver's value-hasher (pandas sort_values over object cells) throws
``TypeError: unhashable type: 'numpy.ndarray'`` on array/map/struct
columns (CORRECTNESS_r01.json, agg_collect).  Every oracled query must
therefore emit scalar columns only; this script audits that invariant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType

from psvm_spark.registry import ORACLES, QUERIES, load_all
from psvm_spark.session import get_spark

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
)


def main() -> int:
    load_all()
    spark = get_spark()
    bad: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    for name in sorted(ORACLES):
        fn = QUERIES[name]
        try:
            df = fn(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            errs.append((name, f"{exc.__class__.__name__}: {str(exc)[:200]}"))
            continue
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f"{f.name}: {f.dataType.simpleString()}"))
    for name, detail in bad:
        print(f"NESTED  {name}  {detail}")
    for name, detail in errs:
        print(f"ERR     {name}  {detail}")
    print(f"checked {len(ORACLES)} oracled queries: "
          f"{len(bad)} nested-output, {len(errs)} build errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
