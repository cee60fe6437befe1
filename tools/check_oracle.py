"""Local stand-in for the driver's CORRECTNESS check: runs every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at sf0.01, compares row count, column names, and order-
insensitive values. Usage: python tools/check_oracle.py [names...]"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from graphrag_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Type-aware canonical form. The driver hashes TYPED values, so a
    DuckDB HUGEINT sum surfacing as float where Spark emits int64 must
    mismatch here too (round-1 token_counts failure mode) — hence the
    i/f/b prefixes."""
    import numpy as np

    if v is None:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return f"b{bool(v)}"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "fnan"
        return "f%.9g" % float(v)
    if isinstance(v, (int, np.integer)):
        return f"i{int(v)}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"s{v}"


def rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                print(f"  WARNING: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            # .df() (not fetchall) so DuckDB's wide types surface the
            # way the driver's pandas-based hasher sees them — e.g.
            # HUGEINT -> float64/object instead of a clean Python int
            dpdf = rel.df()
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            a = rows_canon(scols, [tuple(r) for r in srows])
            b = rows_canon(dcols, drows)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                print(f"FAIL {name}: value mismatch at sorted rows {diff}")
                for i in diff[:2]:
                    print(f"   spark: {a[i]}")
                    print(f"   duck : {b[i]}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failures.append(name)
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
