#!/usr/bin/env python3
"""Local oracle compare, mimicking the driver: for each query result
parquet under OUTDIR, run the matching oracle SQL in DuckDB against the
sf parquet tables, sort columns by name, sort rows, compare values.

Usage: python3 tools/check.py <sfdir> <outdir> [name ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table: a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    if not names:
        names = [n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))]
    bad = 0
    for name in sorted(names):
        spath = os.path.join(outdir, name)
        if not os.path.isdir(spath):
            print(f"{name}: MISSING spark result")
            bad += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{spath}/*.parquet')").fetchdf()
        if name not in oracles:
            print(f"{name}: no_oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"{name}: ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}")
            bad += 1
            continue
        srows = sorted(tuple(norm(v) for v in row) for row in sdf[scols].itertuples(index=False, name=None))
        orows = sorted(tuple(norm(v) for v in row) for row in odf[ocols].itertuples(index=False, name=None))
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"{name}: VALUE MISMATCH ({len(sdf)} rows); first diffs: {diffs}")
            bad += 1
        else:
            print(f"{name}: pass ({len(sdf)} rows)")
    sys.exit(1 if bad else 0)

main()
