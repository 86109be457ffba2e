#!/usr/bin/env python3
"""Stage the reference's REAL TPC-H corpus as parquet fixtures.

Uses DuckDB's offline `CALL dbgen(sf=...)` (the same dbgen the reference
vendors at extension/tpch/dbgen) to produce the genuine 8-table schema —
partsupp included — then exports each table as a single parquet file to
fixtures/tpch/sf<sf>/<table>.parquet.

DECIMAL(15,2) money columns are exported as DOUBLE, matching the
driver-testdata convention (/root/testdata/sf*/lineitem.parquet stores
l_extendedprice etc. as DOUBLE): both engines then read identical
doubles and the gate's rel-1e-12 float tolerance absorbs summation-order
rounding. Dates stay DATE, keys BIGINT, text VARCHAR.

Usage: python3 scripts/stage_tpch.py [sf ...]   (default: 0.01 0.1)
"""
import os
import sys

import duckdb

TABLES = "region nation customer supplier part partsupp orders lineitem".split()


def stage(sf: float, root: str) -> None:
    out = os.path.join(root, f"sf{sf}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CALL dbgen(sf={sf})")
    for t in TABLES:
        cols = con.execute(f"DESCRIBE {t}").fetchall()
        sel = ", ".join(
            f"CAST({name} AS DOUBLE) AS {name}" if typ.startswith("DECIMAL")
            else name
            for name, typ, *_ in cols)
        dest = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT {sel} FROM {t}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        print(f"sf{sf} {t}: {n} rows -> {dest}")
    con.close()


if __name__ == "__main__":
    sfs = [float(a) for a in sys.argv[1:]] or [0.01, 0.1]
    root = os.environ.get("GRAFT_TPCH_ROOT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "tpch")
    for sf in sfs:
        stage(sf if sf != int(sf) else int(sf), root)
