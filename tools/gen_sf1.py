#!/usr/bin/env python3
"""Generate an sf1 PERFORMANCE fixture (10x sf0.1) for the scaling
checkpoint (VERDICT r12 item 5) — driver-side tooling, not library code.

Usage: python3 tools/gen_sf1.py [out_dir]   (default target/sf1)

Derivation, copy i in 0..9 with key stride S=1e8 (all copies disjoint,
all FK relationships preserved within a copy):
- region/nation: dims, copied once (unshifted — FK targets).
- customer/supplier/part/orders/lineitem: every non-nation key +i*S.
- events: event_id/user_id +i*S, ts unchanged (10 disjoint user
  universes in the same time window — sessionization/stream state
  scales linearly, as production fan-out would).
- documents: doc_id +i*S; for i>0 every token of length >= 5 gets a
  per-copy suffix. This keeps doc length, token counts, shingle
  counts and the SHORT-token (stopword) profile intact while making
  copies' shingle sets disjoint: cross-copy Jaccard lands well under
  dedup thresholds, so LSH/MinHash workloads scale linearly instead
  of drowning in 10 exact copies of every doc (45 manufactured dup
  pairs each) that no real 10x corpus growth would produce.
- embeddings: vec_id +i*S; for i>0 a per-(copy,dim) deterministic
  HASH-based sign flip — preserves norms and within-copy geometry,
  decorrelates across copies. Hash-based, not arithmetic (ADVICE
  r13): the old `(i*7 + j) % 2` flip depended only on the parity of
  i+j, so the 10 copies collapsed into 2 flip patterns — 4-5 exact
  cross-copy duplicates per base vector, precisely the manufactured-
  dup inflation this fixture exists to avoid. duckdb's hash() of
  i*1000003 + j gives each copy its own pattern (verified: all 45
  cross-copy pattern pairs differ).

This fixture is for THROUGHPUT measurement only — correctness oracles
stay on the driver-generated SFs.
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
S = 100_000_000
COPIES = 10


def main(out):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")
    # rows must land in a DETERMINISTIC order: the parallel UNION ALL
    # otherwise interleaves copies differently per run, and the
    # resulting parquet layout/compression shifts scan timings between
    # "identical" fixtures (r15: d01 read 3x its pin on a regenerated
    # sf1). preserve_insertion_order keeps the ORDER BY through COPY;
    # Bench additionally fingerprints the fixture (env.fixture_bytes)
    # so pins refuse a mismatched one outright.
    con.execute("SET preserve_insertion_order=true")

    def gen(table, per_copy_sql, order_by, copies=COPIES):
        # order_by is REQUIRED and must be a unique key: DuckDB's sort
        # is not stable for ties, so ordering by a non-unique prefix
        # silently reintroduces the run-to-run layout drift this
        # script exists to kill (ADVICE r15). Assert uniqueness after
        # COPY so a future non-unique key fails loudly, not quietly.
        sql = " UNION ALL ".join(
            per_copy_sql.format(i=i, shift=i * S) for i in range(copies))
        con.execute(
            f"COPY (SELECT * FROM ({sql}) ORDER BY {order_by}) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n, n_keys = con.execute(
            f"SELECT count(*), count(DISTINCT ({order_by})) "
            f"FROM '{out}/{table}.parquet'").fetchone()
        assert n == n_keys, (
            f"{table}: ORDER BY {order_by} is not unique "
            f"({n_keys:,} distinct of {n:,} rows) — layout is "
            f"nondeterministic; pick a unique key")
        print(f"{table:12s} {n:>9,} rows")

    gen("region", f"SELECT * FROM '{SRC}/region.parquet'",
        order_by="r_regionkey", copies=1)
    gen("nation", f"SELECT * FROM '{SRC}/nation.parquet'",
        order_by="n_nationkey", copies=1)

    gen("customer", f"""
        SELECT c_custkey + {{shift}} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""", order_by="c_custkey")
    gen("supplier", f"""
        SELECT s_suppkey + {{shift}} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet'""", order_by="s_suppkey")
    gen("part", f"""
        SELECT p_partkey + {{shift}} AS p_partkey, p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet'""", order_by="p_partkey")
    gen("orders", f"""
        SELECT o_orderkey + {{shift}} AS o_orderkey,
               o_custkey + {{shift}} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""", order_by="o_orderkey")
    gen("lineitem", f"""
        SELECT l_orderkey + {{shift}} AS l_orderkey,
               l_partkey + {{shift}} AS l_partkey,
               l_suppkey + {{shift}} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""",
        # the synthetic lineitem has NO unique short key — even
        # (l_orderkey, l_linenumber) repeats (the r16 assert caught
        # ~143k tied rows/copy that the r15 "deterministic" fixture
        # still left to DuckDB's unstable sort). Full rows ARE unique,
        # so the full column list is the deterministic sort key.
        order_by="l_orderkey, l_linenumber, l_partkey, l_suppkey, "
                 "l_quantity, l_extendedprice, l_discount, l_tax, "
                 "l_returnflag, l_linestatus, l_shipdate")
    gen("events", f"""
        SELECT event_id + {{shift}} AS event_id, ts,
               user_id + {{shift}} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""", order_by="event_id")
    gen("documents", f"""
        SELECT doc_id + {{shift}} AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE array_to_string(list_transform(
                      string_split(text, ' '),
                      t -> CASE WHEN len(t) >= 5
                                THEN t || 'q{{i}}' ELSE t END), ' ')
               END AS text,
               lang, source,
               CAST(len(CASE WHEN {{i}} = 0 THEN text
                    ELSE array_to_string(list_transform(
                      string_split(text, ' '),
                      t -> CASE WHEN len(t) >= 5
                                THEN t || 'q{{i}}' ELSE t END), ' ')
               END) AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet'""", order_by="doc_id")
    gen("embeddings", f"""
        SELECT vec_id + {{shift}} AS vec_id,
               CASE WHEN {{i}} = 0 THEN embedding
                 ELSE list_transform(range(1, 1 + len(embedding)),
                   j -> embedding[j] *
                     CASE WHEN hash({{i}} * 1000003 + j) % 2 = 0
                          THEN 1.0 ELSE -1.0 END)
               END::FLOAT[] AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'""", order_by="vec_id")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/sf1")
