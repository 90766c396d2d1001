"""Self-check mirroring the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 alongside its
``oracle_sql()`` DuckDB equivalent and compares row count, column names, and
a value hash over column-name-sorted, row-sorted results (the driver's
comparison contract). Queries with no oracle get a rows-only check.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style tolerant float compare: round to 6 significant-ish
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def value_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from etl_documentos_spark.session import get_spark

    # args: [sf_dir] [query ...], plus --only a,b,c in either position.
    # Unknown query names are a hard error, NOT an empty filter — a typo'd
    # or misplaced filter otherwise runs zero queries and prints
    # "0 failures", which reads as a green sweep.
    args = sys.argv[1:]
    only: set[str] = set()
    positional: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--only":
            if i + 1 >= len(args):
                print("--only requires a comma-separated query list")
                return 2
            only.update(x for x in args[i + 1].split(",") if x)
            i += 2
        else:
            positional.append(args[i])
            i += 1
    # a path-shaped first positional is the sf_dir (and must exist — a
    # typo'd data dir should say so, not be misreported as an unknown
    # query); bare names are query filters even if a same-named local
    # directory happens to exist
    sf_dir = "/root/testdata/sf0.01"
    if positional and (
        os.sep in positional[0] or positional[0].startswith(".")
    ):
        sf_dir = positional.pop(0)
        if not os.path.isdir(sf_dir):
            print(f"sf_dir does not exist: {sf_dir}")
            return 2
    only.update(positional)

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )

    qs, oracles = queries(), oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # driver-parity type guard: this script normalizes Decimal ->
            # float, so a DuckDB DECIMAL column (e.g. integer sum()) against
            # a Spark integral column passes HERE but hash-fails the driver.
            # Surface the known failure class as a hard FAIL locally.
            # Types come from the lazy relation API (planning only — the
            # query is NOT executed a second time).
            rel = con.sql(oracles[name])
            otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            _INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
            stypes = dict(sdf.dtypes)
            drift = [
                c
                for c, t in otypes.items()
                if t.upper().startswith("DECIMAL")
                and stypes.get(c) in _INTEGRAL
            ]
            if drift:
                failures.append((name, f"type drift (decimal vs int): {drift}"))
                print(
                    f"FAIL {name}: oracle returns DECIMAL for {drift} but "
                    "spark returns integral — cast the SQL (the driver "
                    "compares types strictly)"
                )
                continue
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"columns {sorted(scols)} != {sorted(ocols)}"))
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} != {len(orows)}"))
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            continue
        sk, ok_ = value_key(srows, scols), value_key(orows, ocols)
        if sk != ok_:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sk, ok_)) if a != b
            )
            failures.append((name, f"values differ at sorted row {diff[0]}"))
            print(f"FAIL {name}: values differ; first: {diff[1]} vs {diff[2]}")
            continue
        print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
