#!/usr/bin/env python3
"""Derive an sf1 dataset (10x sf0.1) for scale validation (dev tool only —
the library itself never reads this script's output unless pointed at it).

Ten key-shifted copies of every sf0.1 fact table, with per-copy
perturbation where identical copies would distort the workload's
character:

- documents: copy i>0 suffixes every token run with the copy digit, so
  copies are NOT near-duplicates of each other — the dedup family sees 10x
  the corpus with the same planted-dup density per copy, not a corpus that
  is 90% exact duplicates.
- embeddings: copy i rotates the float array by i positions — rotation
  preserves norms and pairwise cosines WITHIN a copy (each copy keeps its
  planted near-dup pairs) while rotations of the same vector are unrelated
  across copies.
- events: user_id shifts by the OBSERVED user range (1500), so events per
  user stays constant and the user population scales — session/window
  state per key is unchanged, key cardinality grows 10x.
- region/nation stay fixed (TPC-H dims don't scale with SF).

Usage: python3 scripts/make_sf1.py [dstDir]   (default /root/repo/sf1data)
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1data"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def gen(table, per_copy):
    union = " UNION ALL ".join(per_copy(i) for i in range(COPIES))
    con.execute(
        f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


# fixed dims: one copy only
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' "
                "(FORMAT PARQUET)")
    print(t, "copied")

gen("customer", lambda i: f"""
  SELECT c_custkey + {i * 15000} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM {src('customer')}""")

gen("supplier", lambda i: f"""
  SELECT s_suppkey + {i * 1000} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM {src('supplier')}""")

gen("part", lambda i: f"""
  SELECT p_partkey + {i * 20000} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM {src('part')}""")

gen("orders", lambda i: f"""
  SELECT o_orderkey + {i * 150000} AS o_orderkey,
         o_custkey + {i * 15000} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

gen("lineitem", lambda i: f"""
  SELECT l_orderkey + {i * 150000} AS l_orderkey,
         l_partkey + {i * 20000} AS l_partkey,
         l_suppkey + {i * 1000} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}""")

gen("events", lambda i: f"""
  SELECT event_id + {i * 100000} AS event_id, ts,
         user_id + {i * 1500} AS user_id, event_type, value, props
  FROM {src('events')}""")

BS1 = "\\1"  # RE2 rewrite group ref (f-strings can't hold backslashes)

gen("documents", lambda i: f"""
  SELECT doc_id + {i * 5000} AS doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM (SELECT doc_id, lang, source,
          {"text" if i == 0 else
           f"regexp_replace(text, '([A-Za-z0-9]+)', '{BS1}{i}', 'g')"} AS text
        FROM {src('documents')})""")

gen("embeddings", lambda i: f"""
  SELECT vec_id + {i * 2000} AS vec_id,
         {"embedding" if i == 0 else
          f"CAST(list_concat(embedding[{i + 1}:], embedding[1:{i}]) "
          f"AS FLOAT[]) AS embedding"},
         label FROM {src('embeddings')}""")

# DuckDB's parquet writer normalizes timestamps to [us]; the source tables
# use [ns] (events.ts — Spark reads it as BIGINT nanos via
# legacy.parquet.nanosAsLong) and [ms] (o_orderdate, l_shipdate). Cast each
# derived table back to the source's exact arrow schema so sf1 is
# type-identical to the driver's testdata.
import pyarrow as pa
import pyarrow.parquet as pq

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    src_schema = pq.read_schema(f"{SRC}/{t}.parquet")
    dst_path = f"{DST}/{t}.parquet"
    tbl = pq.read_table(dst_path)
    target = pa.schema([src_schema.field(n) for n in tbl.schema.names])
    if tbl.schema != target:
        pq.write_table(tbl.cast(target), dst_path)
        print(f"{t}: schema re-cast to source types")

print("done ->", DST)
