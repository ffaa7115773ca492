#!/usr/bin/env python3
"""Local proxy of the driver's t2 gate: run graft.Verify output against
DuckDB on the same parquet tables and compare per-query (schema-sorted
columns, ordered rows, TYPE-TAGGED values).

Round-1 lesson: the driver's hasher is type-sensitive — DuckDB
DECIMAL/HUGEINT cells hash differently than Spark parquet decimals/longs
even when values are equal, so this tool (a) tags every cell with its
Python type so int-5 vs Decimal-5 FAILS, and (b) hard-fails any query whose
output (either side) contains a DECIMAL column at all. The repo's type
policy is: final oracle schemas carry only BIGINT/DOUBLE/STRING/DATE/
TIMESTAMP/BOOLEAN. This is still a proxy, not the driver's exact hash —
green here is necessary, not sufficient; the policy check closes the known
gap.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, math, decimal, datetime

import duckdb
import pyarrow.parquet as pq


def canon(v):
    """Canonicalize a cell, tagged with its primitive kind so cross-engine
    type drift (int vs Decimal vs float) fails the compare."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v!r}"  # full precision repr — bitwise-faithful for doubles
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def decimal_cols(t):
    """Names of columns with decimal parquet types (banned by type policy)."""
    import pyarrow as pa
    return [f.name for f in t.schema if pa.types.is_decimal(f.type)]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    bad = decimal_cols(t)
    cols = sorted(t.column_names)
    rows = []
    data = {c: t.column(c).to_pylist() for c in cols}
    for i in range(t.num_rows):
        rows.append(tuple(canon(data[c][i]) for c in cols))
    return cols, rows, bad


def run_duck(con, sql):
    # cur.description reports generic DBAPI names ('NUMBER' for every numeric
    # type — verified r10), so it can NOT detect HUGEINT/DECIMAL. Only the
    # relation API exposes real DuckDB types; those are banned by the repo's
    # oracle type policy (they hash differently driver-side).
    rel = con.sql(sql)
    names = list(rel.columns)
    bad = [n for n, t in zip(names, rel.types)
           if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()]
    raw = rel.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(canon(r[i]) for i in order) for r in raw]
    return cols, rows, bad


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    passed, failed = 0, 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            failed += 1
            continue
        scols, srows, sbad = got
        try:
            dcols, drows, dbad = run_duck(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed += 1
            continue
        if sbad or dbad:
            print(f"FAIL {name}: banned types — spark decimal cols={sbad}, "
                  f"duckdb DECIMAL/HUGEINT cols={dbad}")
            failed += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failed += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            failed += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: ")
            i, a, b = bad[0]
            for c, x, y in zip(scols, a, b):
                mark = " " if x == y else "*"
                print(f"  {mark} row{i} {c}: spark={x} duck={y}")
            failed += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            passed += 1
    print(f"== {passed} passed, {failed} failed ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
