"""Delta-format interop without the Delta jar: a transaction-log
replayer (reader) and a protocol-conformant commit writer.

The Delta Lake table layout is an open, published protocol
(delta.io PROTOCOL.md): a directory of parquet data files plus a
``_delta_log/`` of ordered commits — ``<version>.json`` files of
newline-delimited action objects (``protocol`` / ``metaData`` /
``add`` / ``remove`` / ``commitInfo``), optionally compacted into
``<version>.checkpoint.parquet`` files referenced by
``_last_checkpoint``.  A snapshot at version V is the replay of
actions 0..V: the last ``metaData`` wins and the active file set is
every ``add`` whose path has no later ``remove``.

This module implements that replay directly (stdlib json + pyarrow
for checkpoints), so this engine can:

- READ Delta tables written by other systems — current snapshot or
  ``version_as_of`` time travel, including Hive-partitioned tables
  (partition columns reconstructed from ``partitionValues``);
- WRITE Delta tables other systems can read — append / overwrite
  commits with correct add/remove actions, schemaString, atomic
  rename commit files, and periodic parquet checkpoints +
  ``_last_checkpoint``.

Scope (documented, not hidden): reader supports protocol
minReaderVersion 1 tables (no deletion vectors / column mapping);
writer emits minReaderVersion 1 / minWriterVersion 2.  That covers
classic parquet-backed Delta tables; tables using newer reader
features raise rather than silently misread.

Reference parity: the reference system (hendrikx-itc/
python-minerva-etl) stores everything in PostgreSQL and has no lake
format; this backs SURVEY §2 OP-SRC/OP-SNK interop at 100 TB scale
where Delta/Iceberg neighbors are the norm.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = "_delta_log"
_CHECKPOINT_EVERY = 10


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


class DeltaTable:
    """A Delta table rooted at ``path`` — log replay + commit write."""

    def __init__(self, path: str):
        self.path = path

    # ------------------------------------------------ log replay

    def versions(self) -> list[int]:
        d = _log_dir(self.path)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.endswith(".json") and not name.startswith("_"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _checkpoint_before(self, version: int) -> tuple[int, list[dict]]:
        """Latest checkpoint at or below ``version`` (via
        ``_last_checkpoint``, falling back to a directory scan), as
        (checkpoint_version, actions).  (-1, []) when none."""
        import pyarrow.parquet as pq

        d = _log_dir(self.path)
        candidates = []
        for name in os.listdir(d):
            if name.endswith(".checkpoint.parquet"):
                try:
                    v = int(name.split(".", 1)[0])
                except ValueError:
                    continue
                if v <= version:
                    candidates.append(v)
        if not candidates:
            return -1, []
        v = max(candidates)
        tbl = pq.read_table(
            os.path.join(d, f"{v:020d}.checkpoint.parquet"))

        def undict(obj):
            # arrow map<str,str> round-trips as a list of (k, v)
            # tuples; restore the dicts the json-log replay expects
            if isinstance(obj, list) and obj and \
                    all(isinstance(x, tuple) and len(x) == 2
                        for x in obj):
                return {k: undict(val) for k, val in obj}
            if isinstance(obj, list):
                return [undict(x) for x in obj]
            if isinstance(obj, dict):
                return {k: undict(val) for k, val in obj.items()}
            return obj

        actions: list[dict] = []
        for row in tbl.to_pylist():
            for kind in ("protocol", "metaData", "add", "remove"):
                if row.get(kind) is not None:
                    actions.append({kind: undict(row[kind])})
        return v, actions

    def _replay(self, version: int | None = None) -> dict:
        versions = self.versions()
        if not versions:
            raise FileNotFoundError(
                f"no Delta log at {self.path!r} ({_LOG}/ missing or empty)")
        target = versions[-1] if version is None else version
        if target not in versions:
            raise ValueError(
                f"version {target} not in Delta log (have "
                f"{versions[0]}..{versions[-1]})")
        cp_version, actions = self._checkpoint_before(target)
        for v in versions:
            if cp_version < v <= target:
                with open(_commit_path(self.path, v)) as fh:
                    for line in fh:
                        if line.strip():
                            actions.append(json.loads(line))

        meta: dict | None = None
        protocol: dict | None = None
        adds: dict[str, dict] = {}
        for act in actions:
            if "metaData" in act and act["metaData"]:
                meta = act["metaData"]
            elif "protocol" in act and act["protocol"]:
                protocol = act["protocol"]
            elif "add" in act and act["add"]:
                adds[act["add"]["path"]] = act["add"]
            elif "remove" in act and act["remove"]:
                adds.pop(act["remove"]["path"], None)
        if protocol and (protocol.get("minReaderVersion") or 1) > 1 \
                and protocol.get("readerFeatures") not in (None, []):
            raise NotImplementedError(
                f"Delta reader features {protocol.get('readerFeatures')} "
                "not supported (minReaderVersion 1 tables only)")
        if meta is None:
            raise ValueError("Delta log has no metaData action")
        return {"version": target, "metaData": meta,
                "files": list(adds.values())}

    # ------------------------------------------------ read

    def schema(self, version: int | None = None) -> T.StructType:
        snap = self._replay(version)
        return T.StructType.fromJson(
            json.loads(snap["metaData"]["schemaString"]))

    def read(self, spark: SparkSession,
             version_as_of: int | None = None) -> DataFrame:
        """Snapshot read (optionally time-traveled).  Partitioned
        tables: files group by their ``partitionValues`` and the
        partition columns come back as typed literals — one
        spark.read per partition-value combination, unioned (the
        groups are metadata-only; data files are still read in
        parallel inside each group)."""
        snap = self._replay(version_as_of)
        schema = T.StructType.fromJson(
            json.loads(snap["metaData"]["schemaString"]))
        part_cols = snap["metaData"].get("partitionColumns") or []
        files = snap["files"]
        if not files:
            return spark.createDataFrame([], schema)
        data_schema = T.StructType(
            [f for f in schema.fields if f.name not in part_cols])
        by_part: dict[tuple, list[str]] = {}
        for f in files:
            pv = tuple((f.get("partitionValues") or {}).get(c)
                       for c in part_cols)
            by_part.setdefault(pv, []).append(
                os.path.join(self.path, f["path"]))
        out: DataFrame | None = None
        type_of = {f.name: f.dataType for f in schema.fields}
        for pv, paths in sorted(by_part.items()):
            df = spark.read.schema(data_schema).parquet(*paths)
            for c, v in zip(part_cols, pv):
                # Delta serializes partition values as strings (null
                # encoded as JSON null); cast back per table schema
                df = df.withColumn(
                    c, F.lit(v).cast(type_of[c]))
            df = df.select(*[f.name for f in schema.fields])
            out = df if out is None else out.unionByName(df)
        return out

    # ------------------------------------------------ write

    def _next_version(self) -> int:
        vs = self.versions()
        return (vs[-1] + 1) if vs else 0

    def _stage_data_files(self, df: DataFrame) -> list[dict]:
        """Write df as parquet part files at the table root with
        delta-style unique names; return add actions."""
        tmp = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        adds = []
        now = int(time.time() * 1000)
        for name in sorted(os.listdir(tmp)):
            if not name.endswith(".parquet"):
                continue
            final = f"part-{uuid.uuid4().hex}-c000.snappy.parquet"
            os.replace(os.path.join(tmp, name),
                       os.path.join(self.path, final))
            adds.append({"add": {
                "path": final,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(self.path, final)),
                "modificationTime": now,
                "dataChange": True,
            }})
        shutil.rmtree(tmp, ignore_errors=True)
        return adds

    def _commit(self, version: int, actions: list[dict]) -> None:
        """Atomic commit: write to a temp file, rename into place.
        An existing commit file means a concurrent writer won — raise
        (the Delta optimistic-concurrency contract)."""
        final = _commit_path(self.path, version)
        tmp = final + f".{uuid.uuid4().hex}.tmp"
        os.makedirs(_log_dir(self.path), exist_ok=True)
        with open(tmp, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        if os.path.exists(final):
            os.remove(tmp)
            raise FileExistsError(
                f"concurrent Delta commit at version {version}")
        os.replace(tmp, final)
        if version % _CHECKPOINT_EVERY == 0 and version > 0:
            self._write_checkpoint(version)

    def write(self, spark: SparkSession, df: DataFrame,
              mode: str = "append") -> int:
        """Commit ``df`` as a new Delta version.  ``mode``:
        'append' adds files; 'overwrite' also removes every
        previously active file.  Returns the committed version."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported mode {mode!r}")
        os.makedirs(self.path, exist_ok=True)
        version = self._next_version()
        actions: list[dict] = [{"commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": "WRITE",
            "operationParameters": {"mode": mode.upper()},
            "engineInfo": "python-minerva-etl-spark",
        }}]
        if version == 0:
            actions.append({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append({"metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }})
        elif mode == "overwrite":
            # schema may change on overwrite: re-state metaData
            prev = self._replay()
            meta = dict(prev["metaData"])
            meta["schemaString"] = df.schema.json()
            actions.append({"metaData": meta})
            now = int(time.time() * 1000)
            for f in prev["files"]:
                actions.append({"remove": {
                    "path": f["path"], "deletionTimestamp": now,
                    "dataChange": True}})
        actions.extend(self._stage_data_files(df))
        self._commit(version, actions)
        return version

    def _write_checkpoint(self, version: int) -> None:
        """Compact the replay state at ``version`` into
        ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` so readers
        (ours and others') skip the JSON tail."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        # Explicit arrow schema: the protocol types configuration /
        # options / partitionValues as map<string,string>, which
        # cannot be inferred from (possibly empty) python dicts.
        str_map = pa.map_(pa.string(), pa.string())
        cp_schema = pa.schema([
            ("protocol", pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32())])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([
                    ("provider", pa.string()),
                    ("options", str_map)])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", str_map),
                ("createdTime", pa.int64())])),
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", str_map),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_())])),
        ])

        def mapify(d):
            return list((d or {}).items())

        snap = self._replay(version)
        m = snap["metaData"]
        rows = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
             "metaData": None, "add": None},
            {"protocol": None, "add": None,
             "metaData": {
                 "id": m.get("id"),
                 "format": {
                     "provider": (m.get("format") or {}).get(
                         "provider", "parquet"),
                     "options": mapify((m.get("format") or {})
                                       .get("options"))},
                 "schemaString": m.get("schemaString"),
                 "partitionColumns": m.get("partitionColumns") or [],
                 "configuration": mapify(m.get("configuration")),
                 "createdTime": m.get("createdTime")}},
        ]
        for f in snap["files"]:
            rows.append({"protocol": None, "metaData": None,
                         "add": {
                             "path": f["path"],
                             "partitionValues": mapify(
                                 f.get("partitionValues")),
                             "size": f.get("size"),
                             "modificationTime": f.get(
                                 "modificationTime"),
                             "dataChange": bool(f.get("dataChange",
                                                      True))}})
        tbl = pa.Table.from_pylist(rows, schema=cp_schema)
        cp = os.path.join(_log_dir(self.path),
                          f"{version:020d}.checkpoint.parquet")
        pq.write_table(tbl, cp)
        with open(os.path.join(_log_dir(self.path),
                               "_last_checkpoint"), "w") as fh:
            json.dump({"version": version, "size": len(rows)}, fh)


def read_delta(spark: SparkSession, path: str,
               version_as_of: int | None = None) -> DataFrame:
    """Read a Delta table (see :class:`DeltaTable.read`)."""
    return DeltaTable(path).read(spark, version_as_of)


def write_delta(spark: SparkSession, df: DataFrame, path: str,
                mode: str = "append") -> int:
    """Write/commit a Delta table (see :class:`DeltaTable.write`)."""
    return DeltaTable(path).write(spark, df, mode)
