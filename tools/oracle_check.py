#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity, mimicking the driver:
run each oracle_sql.json query in DuckDB over the sf parquet tables and
compare rows+schema against the Spark-written parquet in OUT_DIR.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify-out
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    # normalize values for comparison the way a hash-compare would see them
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY-OUTPUT {name}")
            fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM parquet_scan({files!r}) ").fetchdf()
        if name not in oracle:
            print(f"rows-only    {name}: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else '** ZERO ROWS **'}")
            continue
        want = con.execute(oracle[name]).fetchdf()
        # driver sorts columns by name before hashing
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"MISMATCH     {name}: columns {list(got.columns)} vs {list(want.columns)}")
            fail += 1
            continue
        g = sorted(tuple(canon(v) for v in row) for row in got.itertuples(index=False))
        w = sorted(tuple(canon(v) for v in row) for row in want.itertuples(index=False))
        if g == w:
            print(f"match        {name}: {len(g)} rows")
            ok += 1
        else:
            print(f"MISMATCH     {name}: {len(g)} vs {len(w)} rows")
            for a, b in list(zip(g, w))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            only_g = set(g) - set(w)
            only_w = set(w) - set(g)
            if only_g: print(f"  only-spark ({len(only_g)}): {sorted(only_g)[:2]}")
            if only_w: print(f"  only-duck  ({len(only_w)}): {sorted(only_w)[:2]}")
            fail += 1
    print(f"\n{ok} match, {fail} mismatch")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
