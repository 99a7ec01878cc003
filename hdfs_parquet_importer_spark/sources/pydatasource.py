"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the extension point the reference delegates entirely to Spark's
built-in readers (`package.scala:110-127` only ever calls
`ss.read...csv`). A user-defined source plugs third-party systems
(feature stores, internal APIs, queue snapshots) into the same
DataFrame plan surface as parquet/CSV.

This implementation is a deterministic synthetic event generator:

* every row derives from its `event_id` by pure integer arithmetic
  (Knuth multiplicative hash), so any engine can replay the stream —
  the registered query's DuckDB oracle regenerates the identical rows
  from `range()`;
* `partitions()` splits the id space into round-robin slices, so the
  scan is genuinely parallel — each InputPartition is read by its own
  task, exactly how a real connector shards by file/offset/segment.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

#: Knuth's 2^32 multiplicative-hash constant — mixes ids into a
#: deterministic pseudo-random value stream both engines can replay.
_KNUTH = 2654435761


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` after registration.

    Options:
      rows        total row count (default 1000)
      partitions  number of parallel input slices (default 4)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, user_id long, event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        if self.rows < 0 or self.n_parts < 1:
            # partitions=0 would make partitions() an empty list and
            # the scan silently return 0 rows instead of `rows`.
            raise ValueError(
                f"rows must be >= 0 and partitions >= 1, got "
                f"rows={self.rows} partitions={self.n_parts}"
            )

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        # Round-robin slice: partition i reads ids i, i+P, i+2P, ...
        # Each task touches a disjoint id set; no coordination needed.
        for eid in range(partition.value, self.rows, self.n_parts):
            mixed = (eid * _KNUTH) % 1_000_000
            yield (
                eid,
                eid % 50,
                EVENT_TYPES[eid % 5],
                mixed / 100.0,
            )


def register_synthetic_source(spark) -> None:
    """Idempotently register the source with a SparkSession."""
    spark.dataSource.register(SyntheticEventsDataSource)
