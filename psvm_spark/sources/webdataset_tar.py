"""Python DataSource (Spark 4 API) reading WebDataset-style tar shards.

The WebDataset layout (tar shards of sample-keyed members, one payload
member + optional ``.json`` sidecar per sample) is the de-facto input
format for large multimodal training runs: loaders stream whole shards
sequentially, so the storage layer sees big linear reads instead of
millions of tiny object fetches.  This source mirrors that access
pattern in Spark terms: ``partitions()`` lists one InputPartition per
shard tar, and ``read()`` streams that single tar — a directory of N
shards reads with N-way parallelism and every executor touches only its
own shard, exactly how a 100 TB corpus of ~1 GB shards would fan out.

Classes are defined inside :func:`make_datasource` so cloudpickle
serializes them BY VALUE (the Spark Python workers do not have this
repo on ``sys.path`` — the libsvm_text precedent).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ext", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def make_datasource():
    """Build the DataSource class hierarchy (pickled by value)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    schema = SCHEMA

    class _ShardPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WebDatasetTarReader(DataSourceReader):
        def __init__(self, options):
            import glob
            import os

            path = options.get("path")
            if not path:
                raise ValueError("webdataset_tar: 'path' option is required")
            files = sorted(
                glob.glob(os.path.join(path, "*.tar"))
                if os.path.isdir(path)
                else glob.glob(path)
            )
            self._files = [f for f in files if os.path.isfile(f)]

        def partitions(self):
            return [_ShardPartition(f) for f in self._files] or [_ShardPartition("")]

        def read(self, partition):
            if not partition.path:
                return
            import tarfile

            with tarfile.open(partition.path, "r") as tf:
                for mem in tf.getmembers():
                    # Externally produced shards may carry directory or
                    # special members and non-`<int>.<ext>` names; skip
                    # anything that is not a regular payload file.
                    if not mem.isfile():
                        continue
                    if mem.name.endswith(".json") or "." not in mem.name:
                        continue  # metadata sidecar / nonconforming name
                    stem, ext = mem.name.rsplit(".", 1)
                    if not stem.isdigit():
                        continue
                    fobj = tf.extractfile(mem)
                    if fobj is None:
                        continue
                    data = fobj.read()
                    yield (int(stem), ext, data, len(data))

    class WebDatasetTarDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "webdataset_tar"

        def schema(self):
            return schema

        def reader(self, schema):  # noqa: ARG002 - fixed schema source
            return WebDatasetTarReader(self.options)

    return WebDatasetTarDataSource


def register(spark) -> None:
    spark.dataSource.register(make_datasource())
