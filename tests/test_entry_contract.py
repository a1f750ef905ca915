"""The driver contract, inside the pytest gate: every
``__spark_entry__.queries()`` entry must match its DuckDB oracle at
sf0.001 (fast subset of what tools/check_contract.py runs at sf0.01).
"""

import importlib.util
import math
import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _canon(df):
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        key = []
        for v in rec:
            if isinstance(v, float):
                key.append("nan" if math.isnan(v) else repr(v))
            elif isinstance(v, (bytes, bytearray, memoryview)):
                key.append(bytes(v).hex())
            else:
                key.append(str(v))
        rows.append(tuple(key))
    return sorted(rows)


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_every_query_has_an_oracle(entry_mod):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) == set(osql)
    assert len(qs) >= 21


@pytest.mark.parametrize(
    "name",
    [
        "pip_zones", "pip_zones_cells", "tiling_counts",
        "geocode_roundtrip", "knn_sites",
        "dedup_exact", "text_stats", "lang_counts", "tpch_q1",
        "top_customers", "events_hourly", "events_sequence",
        "pip_zone_stats", "quality_scores", "doc_fingerprint",
        "minhash_sigs", "simhash", "jaccard_pairs", "ann_cosine",
        "raster_sample", "events_sessions", "lang_ngram",
    ],
)
def test_query_matches_oracle(spark, entry_mod, duck, name):
    sdf = entry_mod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _canon(sdf) == _canon(odf)
