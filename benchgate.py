"""Shared contention gate + environment probes for bench.py AND the
scripts/ probes (r11 verdict item 7: SCALE artifacts carried probe
noise because the probes didn't gate; the gate logic lived only in
bench.py).

Everything here is measurement harness, not engine code.  The
committed quiet-box reference figures live in PERF.md: fs write
~400-500 MB/s, read ~5000+ MB/s, synthetic rebaseline ~0.7-1.1 s on
local[32].
"""

from __future__ import annotations

import os
import statistics
import sys
import time

QUIET_REBASELINE_SEC = 0.70
GATE_FACTOR = 1.5
GATE_RETRIES = 8
GATE_WAIT_SEC = 45


def force(df) -> None:
    """Run the plan to completion, materializing every output column."""
    df.write.format("noop").mode("overwrite").save()


def fs_probe(mb: int = 256) -> dict:
    """Deterministic raw-filesystem probe: sequential write+fsync then
    page-cache-warm read of a fresh file under the same tmp root the
    MERGE tables use."""
    import tempfile
    blob = os.urandom(1 << 20)
    with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir(),
                                     delete=False) as fh:
        path = fh.name
        t0 = time.perf_counter()
        for _ in range(mb):
            fh.write(blob)
        fh.flush()
        os.fsync(fh.fileno())
        t_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    with open(path, "rb") as fh:
        while fh.read(1 << 22):
            pass
    t_read = time.perf_counter() - t0
    os.remove(path)
    return {"write_MBps": round(mb / t_write, 1),
            "read_MBps": round(mb / t_read, 1)}


def rebaseline(spark, warmups: int = 2, measured: int = 3) -> float:
    """Fixed synthetic Spark job (no table data, no disk): range ->
    hash-shuffle agg, noop-forced, median of ``measured``.  A
    same-session compute yardstick: flat rebaseline + risen query =
    the query; risen rebaseline = the session/machine."""
    def job():
        from pyspark.sql import functions as F
        return (spark.range(20_000_000)
                .withColumn("k", F.pmod(F.col("id") * 2654435761,
                                        F.lit(1024)))
                .groupBy("k")
                .agg(F.sum("id").alias("s"),
                     F.avg(F.col("id") % 97).alias("a")))
    for _ in range(warmups):
        force(job())
    samples = []
    for _ in range(measured):
        t0 = time.perf_counter()
        force(job())
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def contention_gate(spark, quiet_sec: float = QUIET_REBASELINE_SEC,
                    factor: float = GATE_FACTOR,
                    retries: int = GATE_RETRIES,
                    wait_sec: int = GATE_WAIT_SEC) -> dict:
    """Refuse to silently measure a loaded box: probe, and above
    ``factor`` x the committed quiet figure wait and retry (bounded).
    Returns gate evidence to embed in the artifact:
    ``{"rebaseline_gate": [...], "contended": bool,
    "rebaseline_sec": last}``.  An artifact with contended:true is
    evidence of environment, not of the plans."""
    probes: list[float] = []
    rb = rebaseline(spark)
    probes.append(rb)
    contended = rb > factor * quiet_sec
    for _ in range(retries):
        if not contended:
            break
        print(f"# contention gate: rebaseline {rb:.2f}s > "
              f"{factor:.1f}x quiet ({quiet_sec}s); waiting "
              f"{wait_sec}s", file=sys.stderr)
        time.sleep(wait_sec)
        rb = rebaseline(spark)
        probes.append(rb)
        contended = rb > factor * quiet_sec
    return {"rebaseline_gate": [round(g, 4) for g in probes],
            "contended": bool(contended),
            "rebaseline_sec": rb}
