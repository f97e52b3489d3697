#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the same parquet tables, for a
single-node comparison row next to BENCH_FULL.json's Spark numbers.

Usage: python3 tools/bench_duckdb.py <verify_out_dir> <sf_dir> [iters]

DuckDB here is the strong single-node stand-in for the reference
pipeline (1-thread eager pandas); the engine's goal is to match or beat
single-node throughput at the same scale while keeping a distributed
plan shape. Writes duckdb_bench.json: {query: steady_sec} (min over
iters, first iteration separate as cold).
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(outdir, sfdir, iters=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    steady, cold = {}, {}
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}")
                times.append(-1.0)
                break
            times.append(time.perf_counter() - t0)
        ok = [t for t in times if t >= 0]
        steady[name] = min(ok) if ok else -1.0
        cold[name] = times[0]
        print(f"{name:28s} steady={steady[name]:.3f} cold={cold[name]:.3f}")
    total = sum(v for v in steady.values() if v >= 0)
    out = {"sf_dir": sfdir, "iters": iters, "total_steady_sec": round(total, 3),
           "steady": steady, "cold": cold}
    json.dump(out, open("duckdb_bench.json", "w"), indent=1)
    print(f"== duckdb total steady {total:.1f} s over {len(steady)} queries ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
