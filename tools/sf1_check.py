#!/usr/bin/env python3
"""sf1-scale oracle check for the five heaviest dedup gates (round-7 verdict
item 8). Run `sbt "Test/runMain graft.Sf1Drive"` first — it synthesizes the
10x corpus (per-copy token salting; see its scaladoc for the construction
and the cross-copy editdist impossibility argument) and dumps the five
gates' outputs. This script replays each gate's DuckDB oracle over the same
synthesized corpus and diffs the multisets. The editdist oracle runs PER
COPY: copies are disjoint in q-gram space and every cross-copy pair has
distance >= 2 x tokens >= 20 > maxDist 10 by the salt construction, so the
per-copy union IS the full truth (the script also asserts the engine
reported zero cross-copy pairs).

Usage: python3 tools/sf1_check.py [oracle_sql.json]
(default oracle file: /tmp/verify-out/oracle_sql.json, written by
`sbt "runMain graft.Verify <sfdir> /tmp/verify-out"`)."""
import duckdb
import json
import sys
import time

SF1 = "/root/repo/tmp/sf1/documents.parquet/*.parquet"
OUT = "/root/repo/tmp/sf1-out"
GATES = ["dedup_spans", "dedup_minhash_incremental", "dedup_clusters", "dedup_simhash"]


def compare(con, got_rel, oracle_sql):
    cols = sorted(r[0] for r in con.execute(f"DESCRIBE ({got_rel})").fetchall())
    collist = ", ".join(f'"{c}"' for c in cols)
    n_got, n_ora, d1, d2 = con.execute(
        f"""SELECT (SELECT count(*) FROM ({got_rel})),
            (SELECT count(*) FROM ({oracle_sql})),
            (SELECT count(*) FROM (SELECT {collist} FROM ({got_rel})
              EXCEPT ALL SELECT {collist} FROM ({oracle_sql}))),
            (SELECT count(*) FROM (SELECT {collist} FROM ({oracle_sql})
              EXCEPT ALL SELECT {collist} FROM ({got_rel})))"""
    ).fetchone()
    return n_got, n_ora, n_got == n_ora and d1 == 0 and d2 == 0


def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify-out/oracle_sql.json"
    sqls = json.load(open(oracle_path))
    ok = True
    for g in GATES:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF1}'")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sqls[g])
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()

    # editdist: per-copy oracles; cross-copy pairs impossible by construction
    con = duckdb.connect()
    t0 = time.time()
    cross = con.execute(
        f"SELECT count(*) FROM '{OUT}/dedup_editdist/*.parquet' "
        "WHERE id_a // 10000000 != id_b // 10000000"
    ).fetchone()[0]
    okc = cross == 0
    print(f"dedup_editdist cross-copy pairs (must be 0): {cross}")
    for j in range(10):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{SF1}' WHERE doc_id // 10000000 = {j}"
        )
        got = (f"SELECT * FROM '{OUT}/dedup_editdist/*.parquet' "
               f"WHERE id_a // 10000000 = {j}")
        n_got, n_ora, m = compare(con, got, sqls["dedup_editdist"])
        print(f"  copy {j}: rows={n_got} oracle={n_ora} {'MATCH' if m else 'MISMATCH'}")
        okc &= m
    print(f"dedup_editdist total: {'MATCH' if okc else 'MISMATCH'} "
          f"({time.time() - t0:.0f}s)")
    ok &= okc
    print("SF1 SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


main()
