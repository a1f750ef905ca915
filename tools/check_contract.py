"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
files, and compares row count, column names, and order-insensitive
values (doubles to 12 significant digits; driver likely hashes exact
bytes — exact equality is also reported).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        key = []
        for v in rec:
            if isinstance(v, float):
                if math.isnan(v):
                    key.append("nan")
                else:
                    key.append(repr(v))
            elif isinstance(v, (bytes, bytearray, memoryview)):
                key.append(bytes(v).hex())
            else:
                key.append(str(v))
        rows.append(tuple(key))
    rows.sort()
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from spapy_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]")
    qs = e.queries()
    oracles = e.oracle_sql()
    con = duck_con(sf_dir)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(sdf) != len(odf):
            ok = False
            msgs.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            msgs.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if ok:
            a, b = canon(sdf), canon(odf)
            if a != b:
                ok = False
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                for i in diff:
                    msgs.append(f"row{i}: spark={a[i]} oracle={b[i]}")
                if not diff:
                    msgs.append("length-equal but set differs at tail")
        if ok:
            print(f"PASS {name}: rows={len(sdf)}")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
