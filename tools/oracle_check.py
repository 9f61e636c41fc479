"""Local stand-in for the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB (driver tables registered as views), then
compares row count, column-name sets, and an order-insensitive value
hash (columns sorted by name, rows sorted, floats canonicalized).

Usage:  python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = ["|".join(canon_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    import __spark_entry__ as e
    from llm_drift_detector_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{status} {name}: rows {sn} vs {on}; cols {sc} vs {oc}; hash {sh[:8]} vs {oh[:8]}")
            merged = pd.concat(
                [sdf.head(3).assign(_side="spark"), odf.head(3).assign(_side="oracle")]
            )
            print(merged.to_string(), "\n")
        else:
            print(f"{status} {name} ({sn} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
