"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic sharded synthetic-document generator.

Why this exists: the reference ingests from exactly one place (a CSV
download — /root/reference/dags/online_retail.py:23-32). A Spark-native
engine should also show the *extension* path — how a user plugs a
first-party system (an internal doc store, a feature service, a
simulator) in as a real planner-visible source rather than a
driver-side collect. This source demonstrates the three contracts that
matter at scale:

- ``partitions()`` — one InputPartition per shard: reads parallelize
  across executors exactly like parquet splits.
- ``pushFilters()`` — equality filters on the ``shard`` column are
  consumed by the source (partition PRUNING: pruned shards are never
  generated, the Python-source analogue of partition-pruned scans).
  Every other filter is returned to Spark to re-apply.
- Arrow-batch ``read()`` — rows are emitted as pyarrow RecordBatches
  (the vectorized path; per-tuple yield would bottleneck in pickle).

Determinism: content derives from blake2b(seed, shard, row) — repeated
scans return identical data (a re-run of a failed stage MUST see the
same rows, or speculative execution corrupts results).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "spark shuffle partition batch row table scan merge sort window "
    "hash join filter agg value key stream state store index"
).split()


def _doc_words(seed: int, shard: int, row: int, n: int = 12) -> str:
    h = hashlib.blake2b(f"{seed}:{shard}:{row}".encode(), digest_size=2 * n)
    d = h.digest()
    return " ".join(_WORDS[d[i] % len(_WORDS)] for i in range(n))


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, pruned: bool):
        self.shard = shard
        self.pruned = pruned


class SynthDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.n_shards = int(options.get("shards", "8"))
        self.rows_per_shard = int(options.get("rows_per_shard", "1000"))
        self.seed = int(options.get("seed", "42"))
        self._shard_eq: int | None = None

    def partitions(self):
        if self._shard_eq is not None:
            return [_ShardPartition(self._shard_eq, True)]
        return [_ShardPartition(s, False) for s in range(self.n_shards)]

    def read(self, partition: _ShardPartition):
        import pyarrow as pa

        shard, base = partition.shard, partition.shard * self.rows_per_shard
        texts = [
            _doc_words(self.seed, shard, r) for r in range(self.rows_per_shard)
        ]
        yield pa.record_batch(
            {
                "doc_id": pa.array(
                    [base + r for r in range(self.rows_per_shard)], pa.int64()
                ),
                "shard": pa.array([shard] * self.rows_per_shard, pa.int32()),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int32()),
                "gen_pruned": pa.array(
                    [1 if partition.pruned else 0] * self.rows_per_shard,
                    pa.int32(),
                ),
            }
        )


class SynthDocsPushdownReader(SynthDocsReader):
    """Pushdown-capable variant, opt-in via the ``synthdocs_pushdown``
    format name.

    Separate class on purpose: (a) merely *defining* pushFilters makes
    Spark require ``spark.sql.python.filterPushdown.enabled=true`` for
    every query on the source, and (b) pushdown state leaks JVM-side —
    after a filtered child query plans, the SHARED load() relation keeps
    the pruned partition list, so a later full scan of the parent
    DataFrame silently returns the filtered subset (pinned by
    tests/test_synthetic_source.py as a known Spark 4.1 hazard; a fresh
    reader is built per planning pass — worker
    data_source_pushdown_filters.py — so the leak is in the relation's
    cached scan, out of source-author reach). Production guidance: one
    load() per query lineage when pushdown is on."""

    def pushFilters(self, filters):
        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                self._shard_eq = int(f.value)
            else:
                remaining.append(f)  # Spark re-applies what we don't handle
        return remaining


class SynthDocsDataSource(DataSource):
    """spark.read.format("synthdocs").option("shards", 8)...load()"""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return (
            "doc_id long, shard int, text string, n_chars int, gen_pruned int"
        )

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsReader(schema, self.options)


class SynthDocsPushdownDataSource(SynthDocsDataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs_pushdown"

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsPushdownReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthDocsPushdownDataSource)
    spark.dataSource.register(SynthEventsStreamDataSource)


# ---------------------------------------------------------------------------
# Streaming surface: the same deterministic generator as a micro-batch
# SOURCE (Spark 4 SimpleDataSourceStreamReader).
# ---------------------------------------------------------------------------


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic event stream.

    Offsets are plain row counts ({"offset": n}); each trigger advances
    by ``batch_rows`` until ``max_rows``, then returns empty batches at
    a fixed offset (processAllAvailable drains and stops). The replay
    contract is the whole point: ``readBetweenOffsets(start, end)``
    REGENERATES rows purely from the offsets after a restart, so a
    micro-batch that was planned but lost (checkpointed WAL, crashed
    executor) is re-delivered byte-identical — which only works because
    content is a pure function of the row index (blake2b), never of
    wall-clock or RNG state. Sources that cannot re-serve an offset
    range (a popped queue) need the full DataSourceStreamReader with
    commit()-side retention instead.
    """

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", "500"))
        self.max_rows = int(options.get("max_rows", "2000"))
        self.seed = int(options.get("seed", "42"))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int):
        for i in range(start, end):
            h = hashlib.blake2b(f"{self.seed}:ev:{i}".encode(), digest_size=8)
            d = h.digest()
            yield (
                i,
                d[0] % 50,  # user bucket
                ("view", "click", "purchase", "error")[d[1] % 4],
                round(d[2] + d[3] / 256, 2),
            )

    def read(self, start: dict):
        s = start["offset"]
        e = min(s + self.batch_rows, self.max_rows)
        # a PICKLABLE iterator (list_iterator), not a generator: the
        # prefetch cache serializes it for partition planning, and the
        # drain check calls next() on it expecting StopIteration
        return iter(list(self._rows(s, e))), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["offset"], end["offset"])))


class SynthEventsStreamDataSource(DataSource):
    """spark.readStream.format("synthevents")...load()"""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "event_id long, user_id int, event_type string, value double"

    def simpleStreamReader(self, schema: StructType) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)
