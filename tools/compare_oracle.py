"""Local stand-in for the driver's correctness gate.

Runs each queries()[name] on Spark and oracle_sql()[name] on DuckDB at the
given sf dir; compares row count, sorted column names, and an
order-insensitive value multiset (rows sorted by their string forms).

Usage: python tools/compare_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and format stably
        if v == 0:
            v = 0.0
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from etl_documentos_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[2:] or list(qs)

    spark = get_spark("compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:35s} ROWS-ONLY rows={len(srows)}")
                continue
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
            status, details = "OK", ""
            if sorted(scols) != sorted(dcols):
                status = "SCHEMA-MISMATCH"
                details = f"spark={sorted(scols)} duck={sorted(dcols)}"
            elif len(srows) != len(drows):
                status = "ROWCOUNT-MISMATCH"
                details = f"spark={len(srows)} duck={len(drows)}"
            else:
                a = rowset(scols, srows)
                b = rowset(dcols, drows)
                if a != b:
                    status = "VALUE-MISMATCH"
                    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    details = f"first-diffs={diffs}"
            print(f"{name:35s} {status} rows={len(srows)} {details[:400]}")
            if status != "OK":
                failures.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"{name:35s} ERROR {str(ex)[:300]}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} OK; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
