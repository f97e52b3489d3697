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
import os, sys, json, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def fresh_con(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con


def main(outdir, sfdir, iters=3):
    con = fresh_con(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    steady, cold = {}, {}
    zombies = []
    # optional per-query-iteration watchdog (DUCKDB_BENCH_CAP_SEC, 0 =
    # off): at sf1 the intentionally-quadratic verifier twins (v05/v09
    # class) can run for hours in DuckDB — record -2.0 (timed out, cited
    # separately) instead of stalling the whole comparison. interrupt()
    # from the main thread is duckdb's supported cancellation path.
    cap = float(os.environ.get("DUCKDB_BENCH_CAP_SEC", "0"))
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            err = [None]
            run_con = con  # close over THIS connection: a later rebind
            # of `con` (zombie recovery) must not hand the new
            # connection to a worker started against the old one

            def run():
                try:
                    run_con.sql(sql).fetchall()
                except Exception as e:
                    err[0] = e
            th = threading.Thread(target=run, daemon=True)
            th.start()
            th.join(cap if cap > 0 else None)
            if th.is_alive():
                con.interrupt()
                th.join(60)
                if th.is_alive():
                    # interrupt() + 60 s grace did not stop the worker:
                    # it still uses this connection, and DuckDBPyConnection
                    # is not safe for concurrent use from two threads —
                    # continuing on it could corrupt every remaining
                    # measurement (ADVICE r17). Abandon the connection to
                    # the zombie and reopen a fresh one for the rest of
                    # the sweep; record the event in the artifact.
                    print(f"ZOMBIE {name}: worker outlived interrupt — "
                          "reopening connection")
                    zombies.append(name)
                    con = fresh_con(sfdir)
                print(f"TIMEOUT {name} > {cap}s")
                times.append(-2.0)
                break
            if err[0] is not None:
                print(f"ERR {name}: {err[0]}")
                times.append(-1.0)
                break
            times.append(time.perf_counter() - t0)
        ok = [t for t in times if t >= 0]
        steady[name] = min(ok) if ok else times[-1]
        cold[name] = times[0]
        print(f"{name:28s} steady={steady[name]:.3f} cold={cold[name]:.3f}")
    total = sum(v for v in steady.values() if v >= 0)
    timed_out = sorted(k for k, v in steady.items() if v == -2.0)
    out = {"sf_dir": sfdir, "iters": iters, "total_steady_sec": round(total, 3),
           "cap_sec": cap, "timed_out": timed_out, "zombies": zombies,
           "steady": steady, "cold": cold}
    json.dump(out, open("duckdb_bench.json", "w"), indent=1)
    print(f"== duckdb total steady {total:.1f} s over {len(steady)} queries ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
