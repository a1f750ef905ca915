"""Checkpointed stage runner with per-partition lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json).  The reference has no notion of
checkpoints (eager in-memory library); this is new engine surface.

Model
-----
A pipeline is an ordered list of :class:`Stage`\\ s.  Each stage's
output DataFrame is materialized to ``<base>/<stage>/data`` parquet
with a manifest JSON recording:

- ``input_fingerprint`` — sha256 over the parent manifests' outputs
  (chained, so any upstream change invalidates the suffix);
- per-partition lineage rows (``partition_id, rows_out, wall_ms``)
  captured inside the write pass by a pass-through ``mapInPandas``
  wrapper (TaskContext partition id) and persisted to
  ``<base>/<stage>/metrics`` parquet;
- ``complete`` flag written last (atomic rename), so a killed run
  leaves an incomplete stage that reruns.

``run()`` skips any prefix of stages whose manifests are complete and
fingerprint-matched — resuming mid-pipeline is just rerunning the
driver.  Byte-identity guard: each stage's manifest stores the output
row count and an order-insensitive content fingerprint of a caller-
chosen key column (e.g. sha256(text)) so stage-over-stage invariants
are checkable from the manifests alone.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]  # fn(spark, *parent_dfs) -> DataFrame
    parents: list[str] = field(default_factory=list)
    # optional column whose order-insensitive fingerprint is recorded
    # (the text byte-identity invariant rides on this)
    invariant_col: str | None = None


def _manifest_path(base: str, name: str) -> str:
    return os.path.join(base, name, "manifest.json")


def _read_manifest(base: str, name: str) -> dict | None:
    p = _manifest_path(base, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_manifest(base: str, name: str, m: dict) -> None:
    p = _manifest_path(base, name)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic: complete-flag appears all-or-nothing


def _fingerprint(parents: list[dict]) -> str:
    h = hashlib.sha256()
    for m in parents:
        h.update(m["output_fingerprint"].encode())
    return h.hexdigest()


def _content_fingerprint(df: DataFrame, col: str | None) -> str:
    """Order-insensitive fingerprint: xor-free sum of per-row sha256
    prefixes over ``col`` (or the row count alone when col is None)."""
    if col is None:
        return f"rows={df.count()}"
    s = df.select(
        F.sum(
            F.conv(F.substring(F.sha2(F.col(col).cast("string"), 256), 1, 15),
                   16, 10).cast("decimal(38,0)")
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"sum={s['s']},n={s['n']}"


class CheckpointRunner:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- lineage capture -------------------------------------------------
    def _with_metrics(self, df: DataFrame, metrics_dir: str) -> DataFrame:
        """Pass-through wrapper that records (partition_id, rows_out,
        wall_ms) from inside each task."""
        os.makedirs(metrics_dir, exist_ok=True)
        schema = df.schema

        def wrap(batches):
            from pyspark import TaskContext

            t0 = time.time()
            rows = 0
            for pdf in batches:
                rows += len(pdf)
                yield pdf
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
            # retried/speculative tasks write distinct attempt files;
            # lineage() keeps only the highest attempt per partition
            att = ctx.taskAttemptId() if ctx is not None else 0
            rec = pd.DataFrame(
                {
                    "partition_id": [pid],
                    "attempt_id": [int(att)],
                    "rows_out": [rows],
                    "wall_ms": [int((time.time() - t0) * 1000)],
                }
            )
            rec.to_parquet(
                os.path.join(metrics_dir, f"part-{pid}-{att}.parquet"),
                index=False,
            )

        return df.mapInPandas(wrap, schema=schema)

    # -- main entry ------------------------------------------------------
    def run(self, stages: list[Stage], verbose: bool = False) -> dict[str, DataFrame]:
        """Execute (or resume) the pipeline; returns name → DataFrame of
        every stage's materialized output."""
        outputs: dict[str, DataFrame] = {}
        manifests: dict[str, dict] = {}
        self.skipped: set[str] = set()  # stages resumed from checkpoint
        for st in stages:
            sdir = os.path.join(self.base, st.name)
            ddir = os.path.join(sdir, "data")
            mdir = os.path.join(sdir, "metrics")
            parent_ms = [manifests[p] for p in st.parents]
            fp = _fingerprint(parent_ms)
            existing = _read_manifest(self.base, st.name)
            if (
                existing is not None
                and existing.get("complete")
                and existing.get("input_fingerprint") == fp
            ):
                outputs[st.name] = self.spark.read.parquet(ddir)
                manifests[st.name] = existing
                self.skipped.add(st.name)
                if verbose:
                    print(f"[checkpoint] skip {st.name} (complete)")
                continue
            os.makedirs(sdir, exist_ok=True)
            # rerunning a stage overwrites data but appends metrics —
            # clear stale lineage so a rerun never mixes two runs' rows
            shutil.rmtree(mdir, ignore_errors=True)
            t0 = time.time()
            df = st.fn(self.spark, *[outputs[p] for p in st.parents])
            wrapped = self._with_metrics(df, mdir)
            wrapped.write.mode("overwrite").parquet(ddir)
            out = self.spark.read.parquet(ddir)
            outputs[st.name] = out
            m = {
                "stage": st.name,
                "parents": st.parents,
                "input_fingerprint": fp,
                "output_fingerprint": _content_fingerprint(
                    out, st.invariant_col
                ),
                "wall_s": round(time.time() - t0, 3),
                "complete": True,
            }
            _write_manifest(self.base, st.name, m)
            manifests[st.name] = m
            if verbose:
                print(f"[checkpoint] ran {st.name} in {m['wall_s']}s")
        return outputs

    def lineage(self, stage: str) -> pd.DataFrame:
        """Per-partition lineage rows recorded during the stage's run.

        Task retries/speculation leave multiple attempt files per
        partition; the LATEST ATTEMPT OBSERVED per partition is
        reported.  Note Spark's output commit is first-committer-wins,
        so under speculation the highest attempt id may describe a
        non-committed attempt — for deterministic stages rows_out is
        identical across attempts and wall_ms is informational."""
        import glob

        files = glob.glob(os.path.join(self.base, stage, "metrics", "*.parquet"))
        df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        df = (
            df.sort_values("attempt_id")
            .groupby("partition_id", as_index=False)
            .last()
        )
        return df.drop(columns=["attempt_id"])

    def manifest(self, stage: str) -> dict | None:
        return _read_manifest(self.base, stage)
