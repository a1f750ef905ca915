"""GeoJSON (RFC 7946) vector source/sink — stdlib json + the engine's
WKB codec.

The reference reads/writes GeoJSON through fiona's OGR driver
(/root/reference/SpaVectors.py:195-281 — ``Load`` takes any fiona
format, ``Save`` writes with the dataset's ``Driver``); here it is a
from-scratch parse into the same feature-table shape as
sources/shapefile.py: one row per feature, attribute columns plus a
``geometry`` WKB binary column.

Two layouts:

- ``*.geojson`` FeatureCollection — one JSON object for the whole
  file.  Parsed on the driver (the file is one JSON value, inherently
  unsplittable) exactly like the shapefile reader; fine for the
  layer-sized files the reference trades in.
- newline-delimited features (GeoJSONSeq / RFC 8142 without the RS
  byte, one Feature per line) — parsed DISTRIBUTED: ``spark.read.text``
  splits the file by line ranges, an Arrow-batched ``mapInPandas``
  json-parses each partition.  This is the 100-TB path: a crawl-scale
  feature dump should be stored line-delimited and scales linearly
  with executors.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..geometry import wkb

__all__ = ["read_geojson", "read_geojson_seq", "write_geojson",
           "geometry_to_wkb", "wkb_to_geometry"]


def geometry_to_wkb(geom: dict | None) -> bytes | None:
    """GeoJSON geometry object → WKB (None-preserving, like the
    reference keeps null geometries, SpaVectors.py:214-218)."""
    if geom is None:
        return None
    if geom.get("type") == "GeometryCollection":
        # wkb.dumps's internal collection form keys members under
        # "coordinates"; RFC 7946 uses "geometries"
        geom = {"type": "GeometryCollection",
                "coordinates": geom["geometries"]}
    # wkb.dumps expects plain lists/arrays; GeoJSON's nesting is the
    # same structure (2-D coordinates only, like the rest of the
    # engine — a z in the file raises)
    return wkb.dumps(geom)


def wkb_to_geometry(buf: bytes | None) -> dict | None:
    if buf is None:
        return None
    g = wkb.loads(buf)
    # numpy coordinate arrays → plain lists for json serialization
    return _listify(g)


def _listify(g: dict) -> dict:
    t = g["type"]
    c = g["coordinates"]
    if t == "GeometryCollection":
        return {"type": t, "geometries": [_listify(m) for m in c]}

    def conv(x):
        if isinstance(x, np.ndarray):
            return x.tolist()
        if isinstance(x, (list, tuple)):
            return [conv(e) for e in x]
        return x

    return {"type": t, "coordinates": conv(c)}


def _features_to_pdf(features: list[dict]) -> pd.DataFrame:
    cols: dict[str, list] = {}
    geoms: list[bytes | None] = []
    for i, feat in enumerate(features):
        props = feat.get("properties") or {}
        for k in props:
            if k not in cols:
                cols[k] = [None] * i
        for k in cols:
            cols[k].append(props.get(k))
        geoms.append(geometry_to_wkb(feat.get("geometry")))
    pdf = pd.DataFrame(cols, index=range(len(features)))
    pdf["geometry"] = geoms
    return pdf


def read_geojson_pdf(path: str) -> pd.DataFrame:
    """FeatureCollection file → pandas feature table."""
    with open(path, "r", encoding="utf-8") as f:
        obj = json.load(f)
    if obj.get("type") == "FeatureCollection":
        features = obj["features"]
    elif obj.get("type") == "Feature":
        features = [obj]
    else:  # bare geometry
        features = [{"type": "Feature", "geometry": obj, "properties": {}}]
    return _features_to_pdf(features)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection → Spark feature table (driver parse, same
    contract as shapefile.read_spark)."""
    return spark.createDataFrame(read_geojson_pdf(path))


def read_geojson_seq(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Newline-delimited Features → distributed feature table.

    ``schema`` names the OUTPUT columns (Spark DDL, e.g.
    ``"name string, pop double, geometry binary"``) — required because
    a distributed reader cannot sniff columns without a driver pass.
    Lines are split by Spark's text source (parallel over file
    blocks); each Arrow batch is json-parsed in one python call.
    """
    lines = spark.read.text(path)

    want = [f.strip().split()[0] for f in schema.split(",")]

    def gen(batches):
        for pdf in batches:
            feats = [json.loads(s) for s in pdf["value"] if s.strip()]
            out = _features_to_pdf(feats)
            for c in want:
                if c not in out.columns:
                    out[c] = None
            yield out[want]

    return lines.mapInPandas(gen, schema=schema)


def write_geojson_seq(
    df: DataFrame, path: str, geometry: str = "geometry"
) -> None:
    """DISTRIBUTED feature-table → line-delimited GeoJSON directory:
    each partition renders its Features (Arrow-batched WKB→json) and
    Spark's text sink writes them in parallel — the inverse of
    :func:`read_geojson_seq` and the way to EXPORT at crawl scale
    (one json document per line, splittable on re-read)."""
    attr_cols = [c for c in df.columns if c != geometry]

    def gen(batches):
        for pdf in batches:
            lines = []
            for _, row in pdf.iterrows():
                props = {}
                for c in attr_cols:
                    v = row[c]
                    if isinstance(v, (np.integer,)):
                        v = int(v)
                    elif isinstance(v, (np.floating,)):
                        v = float(v)
                    elif isinstance(v, np.bool_):
                        v = bool(v)
                    if isinstance(v, float) and np.isnan(v):
                        v = None
                    props[c] = v
                lines.append(json.dumps({
                    "type": "Feature",
                    "geometry": wkb_to_geometry(
                        None if row[geometry] is None
                        else bytes(row[geometry])
                    ),
                    "properties": props,
                }))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(gen, schema="value string").write.mode(
        "overwrite"
    ).text(path)


def write_geojson(pdf: pd.DataFrame, path: str) -> None:
    """Feature table (attrs + ``geometry`` WKB) → FeatureCollection.

    Driver-side export like the shapefile writer — the reference's
    Save collects every feature through one fiona handle too
    (SpaVectors.py:264-279).  For crawl-scale output write parquet or
    line-delimited features instead.
    """
    attr_cols = [c for c in pdf.columns if c != "geometry"]
    feats = []
    for _, row in pdf.iterrows():
        geom = wkb_to_geometry(row["geometry"])
        props = {}
        for c in attr_cols:
            v = row[c]
            if isinstance(v, (np.integer,)):
                v = int(v)
            elif isinstance(v, (np.floating,)):
                v = float(v)
            elif isinstance(v, np.bool_):
                v = bool(v)
            props[c] = None if (isinstance(v, float) and np.isnan(v)) else v
        feats.append(
            {"type": "Feature", "geometry": geom, "properties": props}
        )
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
