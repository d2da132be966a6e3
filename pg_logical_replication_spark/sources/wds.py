"""WebDataset tar shards as a first-class Spark source.

``pack_tar_shards`` (operators/multimodal.py) is the EXPORT half; this
is the IMPORT half: a Python DataSource (Spark 4, the ``pg_cdc``
pattern from ``sources/datasource.py``) that reads a directory of
``*.tar`` training shards as a table of members —

    shard string, member string, key string, ext string, payload binary

one batch partition PER SHARD (the shard is WebDataset's unit of
parallelism: a 1000-executor cluster reads 1000 shards concurrently
with zero coordination), and a streaming reader whose offset is the
last shard name (O(1) checkpoint, like the CDC file source) so shards
landing in the directory flow straight into a Structured Streaming
pipeline — train-while-you-pack.

Member names follow the WebDataset convention ``<key>.<ext>``; the
(key, ext) split is precomputed so downstream grouping by sample key
is a plain groupBy.
"""

from __future__ import annotations

import os
import tarfile
from collections.abc import Iterator
from typing import Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

WDS_SCHEMA = (
    "shard string, member string, key string, ext string, payload binary"
)


def _list_shards(path: str) -> list[str]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(n for n in names if n.endswith(".tar"))


def _read_shard(path: str) -> Iterator[Tuple]:
    shard = os.path.basename(path)
    with tarfile.open(path, mode="r") as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            body = tf.extractfile(m).read()
            stem, dot, ext = m.name.rpartition(".")
            key = stem if dot else m.name
            yield (shard, m.name, key, ext if dot else "", body)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WdsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> list[InputPartition]:
        return [
            _ShardPartition(os.path.join(self.path, n))
            for n in _list_shards(self.path)
        ]

    def read(self, partition: _ShardPartition) -> Iterator[Tuple]:
        yield from _read_shard(partition.path)


class WdsStreamReader(SimpleDataSourceStreamReader):
    """Offset = ``{"last_shard": <name>}`` — new shards stream in as
    they land; a shard is the atomic unit (writers must move complete
    tars into the directory, the standard staging rule)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.max_shards = int(options.get("maxshardspertrigger", 0)) or None

    def initialOffset(self) -> dict:
        return {"last_shard": ""}

    def read(self, start: dict):
        after = start.get("last_shard", "")
        pending = [n for n in _list_shards(self.path) if n > after]
        if self.max_shards is not None:
            pending = pending[: self.max_shards]
        if not pending:
            return (iter([]), start)
        rows: list[Tuple] = []
        for n in pending:
            rows.extend(_read_shard(os.path.join(self.path, n)))
        return (iter(rows), {"last_shard": pending[-1]})

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = start.get("last_shard", "")
        hi = end.get("last_shard", "")
        for n in _list_shards(self.path):
            if lo < n <= hi:
                yield from _read_shard(os.path.join(self.path, n))


class WdsDataSource(DataSource):
    """``spark.dataSource.register(WdsDataSource)`` then
    ``spark.read.format("wds").option("path", dir).load()`` (or
    ``readStream`` for the tail-the-directory form)."""

    @classmethod
    def name(cls) -> str:
        return "wds"

    def schema(self) -> str:
        return WDS_SCHEMA

    def reader(self, schema) -> WdsBatchReader:
        return WdsBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return WdsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WdsDataSource)
