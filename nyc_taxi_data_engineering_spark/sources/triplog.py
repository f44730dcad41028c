"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
``triplog`` format — a line-oriented trip-record interchange text
format, registered as a first-class ``spark.read.format("triplog")`` /
``df.write.format("triplog")`` source/sink.

Reference parity: the reference ingests vendor trip files that predate
its lake formats (see SURVEY §2.1's CSV scan surface); this is the
engine-extensibility answer — when a vendor ships a bespoke format, a
user adds a Python DataSource instead of a driver-side parse script.

Format v1 (pipe-delimited, one record per line, UTF-8):

    #triplog v1 trip_id|vendor|ts|distance_km|fare
    42|1-URGENT|1996-01-02T00:00:00|3.1415926|1234.56

- doubles serialize via ``repr`` (shortest round-trip form) and parse
  with ``float`` — BIT-EXACT roundtrip, no precision contract needed;
- timestamps are naive ISO-8601 (the session pins UTC);
- a file is one read partition — ``partitions()`` lists files, so a
  directory of N files reads N-way parallel, exactly how the JSON/CSV
  readers scale;
- the writer follows the task-commit protocol: each task writes a
  ``.tmp`` file and returns its name in a WriterCommitMessage; the
  driver's ``commit()`` atomically renames the batch into place (and
  clears prior data on overwrite) while ``abort()`` removes orphans —
  a failed task never corrupts a published directory.

100 TB: reads and writes are embarrassingly parallel per file/task;
the only driver-side work is the file listing and the rename batch.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from datetime import datetime
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

HEADER = "#triplog v1 trip_id|vendor|ts|distance_km|fare"

SCHEMA = StructType(
    [
        StructField("trip_id", LongType()),
        StructField("vendor", StringType()),
        StructField("ts", TimestampType()),
        StructField("distance_km", DoubleType()),
        StructField("fare", DoubleType()),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class TripLogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("triplog: 'path' option is required")
        self._dir = path

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isfile(self._dir):
            return [_FilePartition(self._dir)]
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.endswith(".triplog")
        )
        if not files:
            raise FileNotFoundError(f"triplog: no .triplog files under {self._dir}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            header = fh.readline().rstrip("\n")
            if header != HEADER:
                raise ValueError(
                    f"triplog: {partition.path} has unsupported header {header!r}"
                )
            for lineno, line in enumerate(fh, start=2):
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("|")
                if len(parts) != 5:
                    raise ValueError(
                        f"triplog: {partition.path}:{lineno}: expected 5 fields, got {len(parts)}"
                    )
                tid, vendor, ts, dist, fare = parts
                yield (
                    int(tid),
                    vendor,
                    datetime.fromisoformat(ts),
                    float(dist),
                    float(fare),
                )


class TripLogWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("triplog: 'path' option is required")
        self._dir = path
        self._overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _Committed:
        tmp = os.path.join(self._dir, f"_part-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(HEADER + "\n")
            for row in iterator:
                ts = row.ts.isoformat() if row.ts is not None else ""
                fh.write(
                    f"{row.trip_id}|{row.vendor}|{ts}|{row.distance_km!r}|{row.fare!r}\n"
                )
                n += 1
        return _Committed(tmp_path=tmp, n_rows=n)

    def commit(self, messages: Sequence[_Committed]) -> None:
        if self._overwrite:
            for f in os.listdir(self._dir):
                if f.endswith(".triplog"):
                    os.remove(os.path.join(self._dir, f))
        for i, m in enumerate(messages):
            final = os.path.join(self._dir, f"part-{i:05d}-{uuid.uuid4().hex[:8]}.triplog")
            os.replace(m.tmp_path, final)

    def abort(self, messages: Sequence[_Committed]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class TripLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tailing of a triplog directory.

    Offset = the lexicographic high-water FILENAME consumed so far
    (``{"watermark": name}``), the same monotone-arrival contract
    Spark's own file stream source leans on: a producer must publish
    files whose names sort AFTER everything already consumed (e.g.
    zero-padded sequence or timestamp prefixes). ``read`` consumes
    every file past the watermark and advances it;
    ``readBetweenOffsets`` re-reads exactly the files in
    ``(start, end]`` — deterministic replay, so a restarted query
    re-produces identical batches and downstream exactly-once sinks
    (streaming/delta_ingest.py) stay exactly-once end to end.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("triplog: 'path' option is required")
        self._dir = path
        self._batch = TripLogReader(options)

    def _files_after(self, watermark: str, upto: str | None = None) -> list[str]:
        if not os.path.isdir(self._dir):
            return []
        names = sorted(
            f for f in os.listdir(self._dir) if f.endswith(".triplog") and f > watermark
        )
        if upto is not None:
            names = [f for f in names if f <= upto]
        return names

    def initialOffset(self) -> dict:
        return {"watermark": ""}

    def read(self, start: dict) -> tuple:
        names = self._files_after(start["watermark"])
        if not names:
            return [], start
        return self._read_files(names), {"watermark": names[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._read_files(self._files_after(start["watermark"], end["watermark"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: files stay owned by the producer

    def _read_files(self, names: list[str]) -> list[tuple]:
        # materialized (not a generator): the streaming harness pickles
        # the batch rows driver-side — the documented Simple-reader
        # small-batch regime
        rows: list[tuple] = []
        for name in names:
            rows.extend(self._batch.read(_FilePartition(os.path.join(self._dir, name))))
        return rows


class TripLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "triplog"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> TripLogReader:
        return TripLogReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> TripLogWriter:
        return TripLogWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> TripLogStreamReader:
        return TripLogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the triplog format on a session."""
    spark.dataSource.register(TripLogDataSource)
