"""Arrow-tier migration audit (verdict r11 item 3).

B580/B581 landed the `applyInArrow` / `udf(useArrow=True)` tiers; this
script measures, at the standard 20x amplification, whether the
EXISTING pandas-tier sites named in the r11 verdict would measurably
benefit from migrating:

  text_compression_ratio  scalar pandas_udf (zlib per doc)
                          -> row-Arrow udf(useArrow=True)
  pack_nextfit            grouped applyInPandas (python linear scan)
                          -> applyInArrow + numpy scan
  cogroup_reconcile       cogrouped applyInPandas (pandas merge)
                          -> cogrouped applyInArrow + numpy join
  mm_decode_features      mapInPandas (per-row numpy decode)
                          -> mapInArrow (RecordBatch in/out)

Protocol: each side is materialized to the noop sink twice on the 20x
fixtures in one session (after a warm-up query); the MIN of the two
runs is scored, so JIT/first-touch costs don't bias either tier.
Variants are value-identical to the shipping keys (asserted once at
base scale via the registered DuckDB oracle comparison path where one
exists) — the audit measures transfer/conversion overhead only.

Decision rule (verdict r11): migrate a site only if the Arrow tier is
>1.5x faster at 20x; otherwise keep pandas and record the measurement
in SCALE.md.

Usage: python scripts/audit_arrow_tier.py OUT.json
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from psvm_spark import registry  # noqa: E402
from psvm_spark.catalog import load_table  # noqa: E402
from psvm_spark.session import get_spark  # noqa: E402

from measure_scale import AMP, build_amplified  # noqa: E402


# ---------------------------------------------------------------- variants


def text_compression_ratio_arrow(spark, sf_dir):
    """Row-Arrow udf variant of text_compression_ratio (same math)."""
    from psvm_spark.queries._util import fan_out
    from psvm_spark.queries.llm import _ZLIB_FP

    fp_scale = _ZLIB_FP

    def fp(t: str) -> int:
        import zlib

        raw = t.encode("utf-8")
        if not raw:
            return fp_scale
        return (len(zlib.compress(raw, 6)) * fp_scale) // len(raw)

    comp_ratio_fp = F.udf(fp, "long", useArrow=True)
    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = d.select("doc_id", comp_ratio_fp(F.col("text")).alias("ratio_fp"))
    bucket = F.least(
        F.expr(f"ratio_fp div {_ZLIB_FP // 10}"), F.lit(9)
    ).cast("int")
    return scored.groupBy(bucket.alias("ratio_decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ratio_fp").cast("bigint").alias("sum_ratio_fp"),
        (
            F.sum("ratio_fp").cast("double")
            / F.count(F.lit(1))
            / F.lit(float(_ZLIB_FP))
        ).alias("mean_ratio"),
    )


def pack_nextfit_arrow(spark, sf_dir):
    """applyInArrow variant of pack_nextfit (same next-fit scan)."""
    from psvm_spark.queries.llm import _NEXTFIT_BUDGET

    budget = _NEXTFIT_BUDGET

    def pack(tbl):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl.column("doc_id")))
        packs = np.empty(tbl.num_rows, dtype=np.int64)
        fill, pid = 0, 0
        for i, nt in enumerate(tbl.column("n_tokens").to_numpy()):
            if pid == 0 or fill + nt > budget:
                pid += 1
                fill = int(nt)
            else:
                fill += int(nt)
            packs[i] = pid
        return tbl.select(["doc_id", "source", "n_tokens"]).append_column(
            "pack_id", pa.array(packs, pa.int64())
        )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return d.groupBy("source").applyInArrow(
        pack, "doc_id long, source string, n_tokens long, pack_id long"
    )


def cogroup_reconcile_arrow(spark, sf_dir):
    """Cogrouped applyInArrow variant of cogroup_reconcile (numpy join)."""
    from psvm_spark.queries.udfs import _COGROUP_SHARDS

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            (F.col("o_orderkey") % _COGROUP_SHARDS).alias("shard"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        (F.col("l_orderkey") % _COGROUP_SHARDS).alias("shard"),
    )

    def reconcile(otbl, ltbl):
        import numpy as np
        import pyarrow as pa

        ok = otbl.column("o_orderkey").to_numpy()
        if len(ok) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "lineitem_total": pa.array([], pa.float64()),
                }
            )
        lk = ltbl.column("l_orderkey").to_numpy()
        cents = np.round(
            ltbl.column("l_extendedprice").to_numpy() * 100
        ).astype(np.int64)
        if len(lk):
            uk, inv = np.unique(lk, return_inverse=True)
            n = np.bincount(inv).astype(np.int64)
            tot = np.bincount(inv, weights=cents).astype(np.int64)
        else:
            uk = np.empty(0, dtype=np.int64)
            n = tot = np.empty(0, dtype=np.int64)
        pos = np.searchsorted(uk, ok)
        safe = np.minimum(pos, max(len(uk) - 1, 0))
        valid = (pos < len(uk)) & (len(uk) > 0)
        if len(uk):
            valid &= uk[safe] == ok
        n_lines = np.where(valid, n[safe] if len(uk) else 0, 0)
        total = np.where(valid, tot[safe] if len(uk) else 0, 0) / 100.0
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "lineitem_total": pa.array(total, pa.float64()),
            }
        )

    return (
        o.groupBy("shard")
        .cogroup(li.groupBy("shard"))
        .applyInArrow(
            reconcile,
            "o_orderkey bigint, n_lines bigint, lineitem_total double",
        )
    )


def mm_decode_features_arrow(spark, sf_dir):
    """mapInArrow variant of mm_decode_features (same decoders)."""
    from psvm_spark.queries.multimodal import media_table

    m = media_table(spark, sf_dir)

    def extract(batches):
        import numpy as np
        import pyarrow as pa

        def decode_ppm(buf: bytes):
            if buf[:2] != b"P6":
                raise ValueError("not a P6 PPM")
            parts, idx = [], 2
            while len(parts) < 3:
                while buf[idx] in b" \t\r\n":
                    idx += 1
                start = idx
                while buf[idx] not in b" \t\r\n":
                    idx += 1
                parts.append(int(buf[start:idx]))
            idx += 1
            w, h, maxval = parts
            if maxval != 255:
                raise ValueError("only maxval=255 supported")
            px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=idx)
            return px.reshape(h, w, 3)

        def decode_wav(buf: bytes):
            if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            sr = int.from_bytes(buf[24:28], "little")
            data_size = int.from_bytes(buf[40:44], "little")
            return sr, np.frombuffer(
                buf, dtype="<i2", count=data_size // 2, offset=44
            )

        for batch in batches:
            mids = batch.column("media_id").to_pylist()
            kinds = batch.column("kind").to_pylist()
            bufs = batch.column("payload").to_pylist()
            feats_out = []
            for kind, buf in zip(kinds, bufs):
                buf = bytes(buf)
                if kind == "image":
                    px = decode_ppm(buf).astype(np.float64)
                    luma = (
                        0.299 * px[:, :, 0]
                        + 0.587 * px[:, :, 1]
                        + 0.114 * px[:, :, 2]
                    )
                    feats = [
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        float(luma.std()),
                    ]
                elif kind == "audio":
                    sr, smp = decode_wav(buf)
                    x = smp.astype(np.float64) / 32768.0
                    feats = [
                        float(x.mean()),
                        float(np.sqrt((x * x).mean())),
                        float(np.abs(x).max()),
                        float(sr),
                    ]
                else:
                    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
                    feats = [
                        float(a.mean()),
                        float(a.std()),
                        float(a.min()),
                        float(a.max()),
                    ]
                feats_out.append(feats)
            yield pa.record_batch(
                {
                    "media_id": pa.array(mids, pa.int64()),
                    "kind": pa.array(kinds, pa.string()),
                    "features": pa.array(
                        feats_out, pa.list_(pa.float64())
                    ),
                }
            )

    out = m.mapInArrow(
        extract, "media_id long, kind string, features array<double>"
    )
    return out.select(
        "media_id",
        "kind",
        F.round(F.col("features")[0], 6).alias("f0"),
        F.round(F.col("features")[1], 6).alias("f1"),
        F.round(F.col("features")[2], 6).alias("f2"),
        F.round(F.col("features")[3], 6).alias("f3"),
    )


VARIANTS = {
    "text_compression_ratio": text_compression_ratio_arrow,
    "pack_nextfit": pack_nextfit_arrow,
    "cogroup_reconcile": cogroup_reconcile_arrow,
    "mm_decode_features": mm_decode_features_arrow,
}


def main() -> int:
    import os

    out_path = sys.argv[1] if len(sys.argv) > 1 else "arrow_tier_audit.json"
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out20 = "/tmp/psvm_scale20"
    spark = get_spark("psvm_arrow_audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    build_amplified(spark, base, out20, AMP)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    mat(registry.QUERIES["agg_pricing_summary"](spark, base))  # warm-up

    # value parity at base scale first: the variant must produce the
    # same canonical rows as the shipping key before its time counts
    from psvm_spark.oracle import _canon_rows

    res = {"amp": AMP, "sites": {}}
    for name, variant in VARIANTS.items():
        cur = _canon_rows(registry.QUERIES[name](spark, base).toPandas())
        var = _canon_rows(variant(spark, base).toPandas())
        assert cur == var, f"{name}: arrow variant is not value-identical"

        times = {"pandas": [], "arrow": []}
        for _ in range(2):
            t = time.perf_counter()
            mat(registry.QUERIES[name](spark, out20))
            times["pandas"].append(time.perf_counter() - t)
            t = time.perf_counter()
            mat(variant(spark, out20))
            times["arrow"].append(time.perf_counter() - t)
        p, a = min(times["pandas"]), min(times["arrow"])
        res["sites"][name] = {
            "pandas_s": round(p, 2),
            "arrow_s": round(a, 2),
            "speedup": round(p / a, 2) if a else None,
            "migrate": bool(a and p / a > 1.5),
        }
        print(
            f"{name}: pandas {p:.2f}s arrow {a:.2f}s "
            f"speedup {p / a:.2f}x -> "
            f"{'MIGRATE' if res['sites'][name]['migrate'] else 'keep pandas'}",
            file=sys.stderr,
        )
    Path(out_path).write_text(json.dumps(res) + "\n")
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
