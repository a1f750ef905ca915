"""Checkpoint/resume + lineage tests (SURVEY.md §5.2 item 6)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from spapy_spark.operators import geocode, pip
from spapy_spark.plans.checkpoint import CheckpointRunner, Stage
from spapy_spark.sources import synth


def _stages():
    def s_docs(spark):
        return synth.webpages(spark, 2000, partitions=4)

    def s_geo(spark, docs):
        return geocode.geocode_coords(docs).where(F.col("lat").isNotNull())

    def s_pip(spark, geo):
        return pip.pip_join_broadcast(
            geo, synth.zones(spark), point_cols=["url", "text"]
        )

    return [
        Stage("docs", s_docs, invariant_col="text"),
        Stage("geo", s_geo, parents=["docs"], invariant_col="text"),
        Stage("pip", s_pip, parents=["geo"], invariant_col="text"),
    ]


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "ckpt")


def test_run_resume_and_lineage(spark, base):
    r1 = CheckpointRunner(spark, base)
    out1 = r1.run(_stages())
    n_pip = out1["pip"].count()
    assert n_pip > 0

    # per-partition lineage was captured for every stage
    lin = r1.lineage("docs")
    assert set(lin["partition_id"]) == {0, 1, 2, 3}
    assert lin["rows_out"].sum() == 2000
    assert (lin["wall_ms"] >= 0).all()

    # byte-identity invariant: text fingerprint propagates docs→geo→pip
    m_docs = r1.manifest("docs")
    assert m_docs["complete"] and m_docs["output_fingerprint"].startswith("sum=")

    # resume: fresh runner, same base — all stages skip, same output
    r2 = CheckpointRunner(spark, base)
    out2 = r2.run(_stages())
    assert out2["pip"].count() == n_pip
    assert r2.skipped == {"docs", "geo", "pip"}
    for s in ("docs", "geo", "pip"):
        assert r2.manifest(s)["complete"]


def test_upstream_invalidation(spark, base):
    r1 = CheckpointRunner(spark, base)
    r1.run(_stages())
    # tamper with the docs output fingerprint → geo + pip must rerun
    mp = os.path.join(base, "docs", "manifest.json")
    m = json.load(open(mp))
    m["output_fingerprint"] = "sum=0,n=0"
    json.dump(m, open(mp, "w"))
    r2 = CheckpointRunner(spark, base)
    r2.run(_stages())
    # docs itself skips (no parents); geo reruns on the fingerprint
    # mismatch; pip skips again because geo's recomputed output
    # fingerprint is unchanged (content-addressed chaining)
    assert r2.skipped == {"docs", "pip"}
    assert r2.manifest("geo")["complete"]


def test_incomplete_stage_reruns(spark, base):
    r1 = CheckpointRunner(spark, base)
    r1.run(_stages())
    # simulate a crash mid-stage: mark pip incomplete
    mp = os.path.join(base, "pip", "manifest.json")
    m = json.load(open(mp))
    m["complete"] = False
    json.dump(m, open(mp, "w"))
    r2 = CheckpointRunner(spark, base)
    out = r2.run(_stages())
    assert r2.skipped == {"docs", "geo"}  # only the crashed stage reruns
    assert r2.manifest("pip")["complete"]
    assert out["pip"].count() > 0
