"""Checkpoint-scoped persisted admission watermark.

The Python DataSource streaming API exposes no ``ReadLimit`` hook
and calls ``latestOffset`` before revealing any start offset, so a
rate-limited source's driver-side watermark starts each (re)started
query UNKNOWN — and the first micro-batch after a restart would plan
the ENTIRE backlog as one batch, the exact failure admission control
exists to prevent (a restart over a 100 TB drop directory must not
scan 100 TB in micro-batch zero).

``option("admissionStateDir", dir)`` closes the hole: the source
persists its rate-limit watermark to ``dir`` (atomic tmp+rename, one
tiny JSON per advance) and reloads it on construction, so the first
``latestOffset`` of a restarted query caps relative to where the
previous run left off.  The directory plays the same role as a
checkpoint: it must be scoped to ONE query (sharing it across queries
caps them against each other's progress), and it must outlive the
query like the checkpoint does.

Persistence points and why they suffice:

* ``latestOffset`` — after computing the (capped) end.  Every offset
  Spark ever writes to its own offset log came out of some
  ``latestOffset`` call, so persisting here keeps the state file
  AT OR AHEAD of the log.  A reloaded watermark therefore never
  makes ``latestOffset`` return an offset BELOW the restart point —
  returning one would regress Spark's offset log (and, for Iceberg,
  plan a start→ancestor walk that cannot exist).
* ``commit`` — belt-and-braces refresh (also covers a run whose
  only progress was replaying a pre-existing plan).

The watermark is a rate-limit HINT, never a correctness input:
exactly-once comes from Spark's offset log and the sources' range
semantics.  A stale (behind) file merely makes the first batch
bigger than the cap; a file one ``latestOffset`` AHEAD of the log
(crash between persist and Spark's log write) merely lets the first
restarted batch cover up to two caps' worth.  Both are bounded; the
unbounded case is gone.

Misuse is refused loudly: the state file records which source and
which source path wrote it, and a reload for a different source or
path raises instead of silently rate-limiting against a foreign
stream's progress.
"""
from __future__ import annotations

import json
import os
import tempfile

_STATE_NAME = "admission-watermark.json"


class PersistedWatermark:
    """Atomic single-value store for a source's admission watermark.

    ``value`` may be any JSON-serializable scalar the source uses to
    order its progress (file name for the Avro drop source, version
    int for Delta, snapshot id for Iceberg).
    """

    def __init__(self, state_dir: str, source: str, source_path: str):
        self.dir = state_dir
        self.source = source
        self.source_path = source_path
        self._last_saved = None

    def _file(self) -> str:
        return os.path.join(self.dir, _STATE_NAME)

    def load(self):
        """Return the persisted watermark value, or None if absent.

        Refuses a state file written by a different source type or
        for a different source path — a shared/misconfigured
        admissionStateDir must fail loudly, not cap this query
        against a foreign stream's progress.
        """
        try:
            with open(self._file()) as fh:
                state = json.load(fh)
        except FileNotFoundError:
            return None
        if (state.get("source") != self.source
                or state.get("source_path") != self.source_path):
            raise ValueError(
                f"admissionStateDir {self.dir!r} belongs to "
                f"source {state.get('source')!r} on path "
                f"{state.get('source_path')!r}, not {self.source!r} "
                f"on {self.source_path!r} — each rate-limited query "
                "needs its own state dir (like a checkpoint)")
        self._last_saved = state.get("watermark")
        return self._last_saved

    def save(self, value) -> None:
        """Persist ``value`` (atomic tmp+rename); no-op if unchanged."""
        if value is None or value == self._last_saved:
            return
        os.makedirs(self.dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            prefix=".admission-", suffix=".tmp", dir=self.dir)
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump({"v": 1, "source": self.source,
                           "source_path": self.source_path,
                           "watermark": value}, fh)
            os.replace(tmp, self._file())
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        self._last_saved = value


def attach_state(options_get, source: str, source_path: str,
                 has_cap: bool):
    """Build the source's PersistedWatermark from its options, or
    None when ``admissionStateDir`` is not set.  Requires a cap:
    a state dir without any rate limit is a misconfiguration (there
    is no watermark to persist) and is refused rather than ignored.
    ``options_get(name) -> str | None`` is the source's option
    accessor (case-insensitive in the DataSource API).
    """
    sd = options_get("admissionStateDir")
    if sd is None:
        if str(options_get("assumeFreshStart") or
               "false").lower() == "true":
            raise ValueError(
                "assumeFreshStart requires admissionStateDir — the "
                "state file is how a restart is told apart from a "
                "fresh start; without it a restarted query would "
                "cap from the epoch, regress Spark's offset log, "
                "and double-read after a crash")
        return None
    if not has_cap:
        raise ValueError(
            "admissionStateDir is set but no rate limit is — pass "
            "maxFilesPerTrigger / maxBytesPerTrigger (or the "
            "source's equivalent) alongside it")
    return PersistedWatermark(str(sd), source, source_path)


def fresh_start_floor(options_get, state, loaded, floor):
    """The initial admission watermark for a BRAND-NEW query, closing
    the cold-backlog hole: with ``option("assumeFreshStart", "true")``
    (plus the required ``admissionStateDir``) and NO state file, the
    watermark primes to ``floor`` (the source's epoch), so even the
    very first ``latestOffset`` of the query's first run caps — a
    100 TB initial snapshot/backlog drains in bounded batches from
    batch zero instead of planning as one batch.

    The two-key interlock makes it safe: every rate-limited run
    persists at its first ``latestOffset``, so a state file EXISTS
    for any query that ever ran — its absence plus the user's
    explicit fresh-start assertion is the only combination that
    primes low.  A reloaded watermark always wins (restart detected,
    assertion ignored).  The residual misuse — deleting the state
    dir while keeping the checkpoint AND passing assumeFreshStart —
    is documented as the same class of error as deleting half a
    checkpoint: the state dir's lifecycle is bound to the
    checkpoint's.  Returns ``loaded`` when present, else ``floor``
    when the assertion is set, else None (today's uncapped first
    batch)."""
    if loaded is not None:
        return loaded
    if state is not None and str(
            options_get("assumeFreshStart") or "false"
            ).lower() == "true":
        return floor
    return None
