#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB with views over <sf_dir>/*.parquet, loads the Spark parquet
result from <verify_out_dir>/<name>/, and compares: schema (column names),
row count, and a canonicalized value hash (columns sorted by name, rows
sorted, doubles kept at full repr — they must be bit-identical by design).
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "\\N"
    if isinstance(val, float):
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        err_marker = f"{spark_dir}/_ERROR"
        if os.path.exists(err_marker):
            msg = open(err_marker).read().strip()
            print(f"FAIL {name}: spark error: {msg[:200]}")
            n_fail += 1
            continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(spark_dir)
        # the r15 c17 lesson: this checker's canon() collapses decimals
        # via str() and passed a column the driver's stricter hash
        # rejected. Fail loudly on any non-driver-stable output type so
        # local green implies driver green (RegistryShapeSpec enforces
        # the same contract in-JVM).
        import pyarrow as pa

        def unstable(t):
            # recurse into containers (ADVICE r16: a list<float32> or
            # struct<decimal> passed the top-level-only check, making
            # this guard weaker than the in-JVM RegistryShapeSpec)
            if (pa.types.is_decimal(t) or pa.types.is_float32(t)
                    or pa.types.is_binary(t) or pa.types.is_large_binary(t)
                    or pa.types.is_fixed_size_binary(t)):
                return True
            if (pa.types.is_list(t) or pa.types.is_large_list(t)
                    or pa.types.is_fixed_size_list(t)):
                return unstable(t.value_type)
            if pa.types.is_struct(t):
                return any(unstable(t.field(i).type) for i in range(t.num_fields))
            if pa.types.is_map(t):
                return unstable(t.key_type) or unstable(t.item_type)
            return False

        bad_types = [f"{f.name}: {f.type}" for f in tbl.schema
                     if unstable(f.type)]
        if bad_types:
            print(f"FAIL {name}: non-driver-stable output types "
                  f"(cast at the projection boundary): {bad_types}")
            n_fail += 1
            continue
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        try:
            res = con.sql(sql)
            d_cols = list(res.columns)
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        hs = table_hash(s_cols, s_rows)
        hd = table_hash(d_cols, d_rows)
        if hs != hd:
            print(f"FAIL {name}: hash spark={hs} duck={hd}")
            # show first differing canon row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            ls = sorted("\x01".join(canon(r[i]) for i in order_s) for r in s_rows)
            ld = sorted("\x01".join(canon(r[i]) for i in order_d) for r in d_rows)
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"  spark: {a[:200]}")
                    print(f"  duck : {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {hs})")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
