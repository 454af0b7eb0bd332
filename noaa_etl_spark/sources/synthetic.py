"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic weather-observation generator.

This demonstrates the engine's extension point for sources Spark lacks
(bespoke archive formats, internal services): implement
``DataSource``/``DataSourceReader`` with ``partitions()`` so the scan
parallelizes across executors — each partition generates its slice
independently (no driver bottleneck), exactly how a real partitioned
ingest (byte-ranges of a huge file, shards of a service) plugs in.

Register + use:

    spark.dataSource.register(SyntheticObsDataSource)
    df = spark.read.format("synthetic_obs").option("n_stations", 5).load()

Determinism: values derive from md5(station, day, element) — stable
across runs/machines, no RNG state.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

try:  # Spark 4+ only; the engine degrades gracefully without it.
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore
    DataSourceReader = object  # type: ignore
    InputPartition = object  # type: ignore
    SimpleDataSourceStreamReader = object  # type: ignore
    _HAS_DATASOURCE_API = False

OBS_SCHEMA = "station_id string, day int, element string, value_scaled int"
ELEMENTS = ("TMAX", "TMIN", "PRCP")


def _det_value(station: int, day: int, element: str) -> int:
    digest = hashlib.md5(f"{station}:{day}:{element}".encode()).digest()
    return int.from_bytes(digest[:2], "little") % 1000


@dataclass
class _StationPartition(InputPartition):
    station: int


class SyntheticObsReader(DataSourceReader):
    def __init__(self, schema, options):
        self.n_stations = int(options.get("n_stations", 4))
        self.n_days = int(options.get("n_days", 31))

    def partitions(self):
        # One input partition per station → the scan parallelizes.
        return [_StationPartition(s) for s in range(self.n_stations)]

    def read(self, partition):
        s = partition.station
        sid = f"SYN{s:08d}"
        for day in range(1, self.n_days + 1):
            for element in ELEMENTS:
                yield (sid, day, element, _det_value(s, day, element))


class SyntheticObsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of :class:`SyntheticObsReader` — continuous-ingest
    parity for the custom source (the batch reader alone can't model a
    feed that keeps arriving).

    Offset contract: ``{"day": k}`` means days 1..k are fully emitted.
    Each micro-batch advances by ``days_per_batch`` days across ALL
    stations; when the feed is exhausted (``day == n_days``) ``read``
    returns an empty iterator with an unchanged offset, which is how
    availableNow/processAllAvailable know to stop. ``readBetweenOffsets``
    regenerates any (start, end] range deterministically (no buffered
    state), so checkpoint recovery replays exactly the lost batch —
    the generator-derived values make replay idempotent by construction.
    """

    def __init__(self, schema, options):
        self.n_stations = int(options.get("n_stations", 4))
        self.n_days = int(options.get("n_days", 31))
        self.days_per_batch = int(options.get("days_per_batch", 7))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def _rows(self, first_day: int, last_day: int):
        for s in range(self.n_stations):
            sid = f"SYN{s:08d}"
            for day in range(first_day, last_day + 1):
                for element in ELEMENTS:
                    yield (sid, day, element, _det_value(s, day, element))

    def read(self, start: dict):
        first = start["day"] + 1
        last = min(start["day"] + self.days_per_batch, self.n_days)
        if first > last:  # exhausted: no new data, offset unchanged
            return iter([]), start
        # Materialized (not a generator): Spark's prefetch cache copies
        # the iterator for commit-time replay, and generators can't be
        # copied. Bounded by days_per_batch — this is the micro-batch.
        return iter(list(self._rows(first, last))), {"day": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["day"] + 1, end["day"])


class SyntheticObsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_obs"

    def schema(self):
        return OBS_SCHEMA

    def reader(self, schema):
        return SyntheticObsReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return SyntheticObsStreamReader(schema, self.options)
