"""Warehouse-pattern operator properties."""

from __future__ import annotations

from psvm_spark import registry

registry.load_all()
class TestWriteAuditPublish:
    def test_gate_blocks_corrupt_batch(self, spark, sf_dir):
        rows = {
            r.batch: r
            for r in registry.QUERIES["warehouse_write_audit_publish"](
                spark, sf_dir
            ).collect()
        }
        assert rows["clean"].audit_pass and rows["clean"].published
        assert not rows["corrupt"].audit_pass and not rows["corrupt"].published
        # the audit counted every source row through the staged bytes
        from psvm_spark.catalog import load_table

        assert rows["clean"].n_src_rows == load_table(spark, sf_dir, "orders").count()
        assert len(rows["clean"].checksum) == 32
