"""Avro object-container directories as a registered Spark data
source — batch AND Structured Streaming — via PySpark 4's Python
DataSource API, no spark-avro jar:

    register_avro_source(spark)
    spark.read.format("minerva_avro").load(path)             # batch
    (spark.readStream.format("minerva_avro")                 # stream
     .load(path))

Both modes ride the splittable engine in ``sources/avro.py``: input
partitions are BYTE-RANGE SPLITS aligned on the container's sync
markers (``option("split_bytes", …)``, default 128 MiB), blocks
stream, per-task memory is file-size-independent, and every task
re-checks its file's writer schema against the directory's first
file (mixed-schema directories fail loudly).

The STREAMING source tails a GROWING DIRECTORY — the Kafka-archive /
ingest-drop pattern.  Offsets are the count of processed files in
sorted-name order, so file names must be append-ordered (uuid- or
timestamp-prefixed part files, the shape every distributed writer
produces — including :func:`sources.avro.write_avro`).  A file that
sorts BEFORE the high-water mark after the stream has passed it is
never picked up (same contract as Spark's file sources without
their journal); each trigger's new files shatter into splits like
the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (DataSource,
                                    DataSourceArrowWriter,
                                    DataSourceReader,
                                    DataSourceStreamArrowWriter,
                                    DataSourceStreamReader,
                                    InputPartition,
                                    WriterCommitMessage)


def _opt(options: dict, name: str, default=None):
    lowered = {str(k).lower(): v for k, v in options.items()}
    return lowered.get(name.lower(), default)


class _SplitPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, canon: str,
                 writer_schema: dict, plan, plan_gen,
                 colnames: list[str], batch_bytes: int):
        self.path = path
        self.start = start
        self.end = end
        self.canon = canon
        self.writer_schema = writer_schema
        self.plan = plan
        self.plan_gen = plan_gen
        self.colnames = colnames
        self.batch_bytes = batch_bytes


def _read_split(p: _SplitPartition, schema: T.StructType):
    """One byte-range split → arrow RecordBatches (executor-side)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from ..sources.avro import split_frames

    target = to_arrow_schema(schema)
    for pdf in split_frames(p.path, p.start, p.end, p.canon,
                            p.writer_schema, p.plan, p.plan_gen,
                            p.colnames, p.batch_bytes):
        tbl = pa.Table.from_pandas(pdf, schema=target,
                                   preserve_index=False)
        yield from tbl.to_batches()


class _AvroPlanMixin:
    def _plan(self, options: dict):
        from ..sources.avro import plan_read

        self.path = _opt(options, "path")
        if not self.path:
            raise ValueError("minerva_avro requires a path")
        self.split_bytes = int(_opt(options, "split_bytes",
                                    128 << 20))
        self.batch_bytes = int(_opt(options, "batch_bytes",
                                    64 << 20))
        (files, self.writer_schema, self.schema_, self.canon,
         self.plan_, self.plan_gen, self.colnames) = \
            plan_read(self.path)
        return files

    def _partitions_for(self, files: list[str]):
        from ..sources.avro import plan_splits

        return [_SplitPartition(p, s, e, self.canon,
                                self.writer_schema, self.plan_,
                                self.plan_gen, self.colnames,
                                self.batch_bytes)
                for p, s, e in plan_splits(files, self.split_bytes)]


class _AvroBatchReader(DataSourceReader, _AvroPlanMixin):
    def __init__(self, options: dict):
        self.files = self._plan(options)

    def partitions(self):
        return self._partitions_for(self.files)

    def read(self, partition):
        return _read_split(partition, self.schema_)


class _AvroStreamReader(DataSourceStreamReader, _AvroPlanMixin):
    """Offsets: {"n": count of processed files, "hw": last processed
    file name} in sorted-name order.  A file arriving that sorts AT
    OR BEFORE the high-water mark FAILS the stream (silently
    skipping it, or double-reading the tail, would both be worse) —
    the same append-ordered-names contract Spark's file sources
    have without their journal."""

    def __init__(self, options: dict):
        self._plan(options)

    def _listing(self) -> list[str]:
        from ..sources.avro import _list_files

        try:
            return _list_files(self.path)  # sorted
        except FileNotFoundError:
            # an ingest-drop directory that is empty RIGHT NOW is a
            # normal streaming state (producer not started yet) —
            # idle trigger, not a crash.  Schema was derived at plan
            # time, so nothing else needs the files.
            return []

    def initialOffset(self) -> dict:
        return {"n": 0, "hw": ""}

    def latestOffset(self) -> dict:
        files = self._listing()
        return {"n": len(files),
                "hw": os.path.basename(files[-1]) if files else ""}

    def partitions(self, start: dict, end: dict):
        listing = self._listing()
        sn, en = int(start["n"]), int(end["n"])
        if len(listing) < en:
            raise ValueError(
                f"minerva_avro stream: offset {en} but only "
                f"{len(listing)} files remain — files were removed "
                "under a running stream")
        files = listing[sn:en]
        hw = start.get("hw") or ""
        bad = [f for f in files if os.path.basename(f) <= hw]
        if bad:
            raise ValueError(
                "minerva_avro stream: file(s) arrived sorting at or "
                f"before the processed high-water mark {hw!r}: "
                f"{[os.path.basename(f) for f in bad]} — the source "
                "requires append-ordered file names (uuid/timestamp "
                "part files); reprocess with a batch read")
        return self._partitions_for(files)

    def read(self, partition):
        return _read_split(partition, self.schema_)

    def commit(self, end: dict) -> None:
        pass


class _AvroCommit(WriterCommitMessage):
    def __init__(self, tmp: str | None, rows: int):
        self.tmp = tmp
        self.rows = rows


class _AvroWriter(DataSourceArrowWriter):
    """Append-only batch writer: each task encodes ONE
    object-container to a hidden ``.tmp`` (invisible to readers —
    ``_list_files`` globs ``*.avro``), the driver renames them to
    final ``part-<seq>-<i>.avro`` names on commit; abort deletes the
    temps.  ``<seq>`` is a zero-padded epoch-ms stamp so files from
    successive jobs keep the SORTED-NAME append order the streaming
    source's offsets rely on."""

    def __init__(self, options: dict, schema, overwrite: bool):
        from ..sources.avro import _avro_schema_of

        if overwrite:
            raise NotImplementedError(
                "minerva_avro writer is append-only "
                "(mode('append')); a drop directory is never "
                "rewritten in place")
        self.path = _opt(options, "path")
        if not self.path:
            raise ValueError("minerva_avro requires a path")
        self.codec = _opt(options, "codec", "deflate")
        self.force_required = str(_opt(
            options, "force_required", "false")).lower() == "true"
        self.block_bytes = int(_opt(options, "block_bytes",
                                    4 << 20))
        # fail fast on the driver: unsupported column types raise at
        # planning, before any executor work
        self.avro_schema = _avro_schema_of(schema,
                                           self.force_required)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import uuid as _uuid

        from ..sources.avro import encode_container

        blob, rows = encode_container(
            (b.to_pandas() for b in iterator), self.avro_schema,
            self.codec, self.block_bytes)
        if blob is None:
            return _AvroCommit(None, 0)
        tmp = os.path.join(self.path,
                           f".stage-{_uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        return _AvroCommit(tmp, rows)

    def _finalize(self, messages, seq: str) -> int:
        import uuid as _uuid

        total = 0
        i = 0
        for m in messages:
            if not m or not m.tmp:
                continue
            # uuid suffix: two batch jobs committing in the same
            # epoch-ms must not silently os.rename over each other
            dst = os.path.join(
                self.path,
                f"part-{seq}-{i:05d}-{_uuid.uuid4().hex[:8]}.avro")
            os.rename(m.tmp, dst)
            total += m.rows
            i += 1
        return total

    def commit(self, messages):
        import time as _time

        self._finalize(messages, f"{int(_time.time() * 1000):015d}")

    def abort(self, messages):
        for m in messages:
            if m and m.tmp:
                try:
                    os.remove(m.tmp)
                except OSError:
                    pass


class _AvroStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once STREAMING sink for the drop directory: each
    micro-batch's files commit under a ``part-<batchId>-…`` prefix
    (10-digit zero-padded, so batches keep the sorted-name append
    order); a REPLAYED batch finds its prefix already present,
    deletes its staged temps, and commits nothing — the prefix IS
    the ledger."""

    def __init__(self, options: dict, schema, overwrite: bool):
        self._batch = _AvroWriter(options, schema, overwrite)

    def write(self, iterator):
        return self._batch.write(iterator)

    def commit(self, messages, batchId: int):
        import glob as _glob

        seq = f"{int(batchId):010d}"
        already = _glob.glob(os.path.join(
            self._batch.path, f"part-{seq}-*.avro"))
        if already:
            self.abort(messages, batchId)  # replay: ledger hit
            return
        self._batch._finalize(messages, seq)

    def abort(self, messages, batchId: int):
        self._batch.abort(messages)


class MinervaAvroDataSource(DataSource):
    """`format("minerva_avro")` — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "minerva_avro"

    def schema(self):
        from ..sources.avro import plan_read

        path = _opt(dict(self.options), "path")
        if not path:
            raise ValueError("minerva_avro requires a path")
        return plan_read(path)[2]

    def reader(self, schema) -> DataSourceReader:
        return _AvroBatchReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _AvroStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool):
        return _AvroWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _AvroStreamWriter(dict(self.options), schema,
                                 overwrite)


def register_avro_source(spark: SparkSession) -> None:
    """Register ``minerva_avro`` for this session (idempotent)."""
    spark.dataSource.register(MinervaAvroDataSource)
