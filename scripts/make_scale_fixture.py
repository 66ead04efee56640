#!/usr/bin/env python3
"""Build a 10× scale fixture (sf1) from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs at least
one measured decade of scaling, so this derives sf1 by K-fold
replication with key offsets — deterministic (no RNG), FK-consistent,
and constructed so every workload dimension scales LINEARLY the way a
real corpus grows (more users / more docs — not fatter users):

- fact tables (customer/supplier/part/orders/lineitem/events):
  copy c shifts every key by ``c * (max_key + 1)`` of its table, so
  orders→customer / lineitem→orders|part|supplier / events.user_id
  references stay valid per copy and per-key group sizes are
  UNCHANGED (windows, sessionization, per-user all-pairs stay the
  same per-group cost; there are just 10× more groups).
- region/nation stay fixed (dimensions don't grow with corpus size).
- documents: copy 0 is verbatim; copy c>0 suffixes every token with
  ``~c``, so shingle/token sets are disjoint ACROSS copies while
  within-copy near-dup structure is bit-identical — duplicate-pair
  counts scale 10×, not 100× (replicating text verbatim would make
  every doc an exact cross-copy dup and quadratically explode any
  honest dedup measurement). n_chars is recomputed from the new text.
- embeddings: copy c rotates each 64-d vector left by c positions —
  norms and within-copy cosines are exactly preserved, cross-copy
  cosines decorrelate, so ANN/near-dup neighbor structure scales
  linearly too. ``label`` is offset per copy (10× more clusters, not
  10× fatter clusters — per-label all-pairs ops stay linear, the same
  way a real corpus grows).

Output: single snappy parquet file per table (same layout the driver
uses) under testdata_scaled/sf1/. DuckDB does the whole thing
out-of-core; ~20s.

Usage: python3 scripts/make_scale_fixture.py [out_dir] [K] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"
OUT_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_scaled", "sf1")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else OUT_DEFAULT
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else SRC_DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    con = duckdb.connect()
    # Physical-type parity with the driver's files: timestamps must
    # come back to Spark as TIMESTAMP (LTZ), not TIMESTAMP_NTZ, so
    # write them as TIMESTAMPTZ (isAdjustedToUTC=true) under UTC;
    # events.ts stays nanosecond-precision via int64 epoch-ns (the
    # engine's read path converts bigint ns, readers.py).
    con.execute("SET TimeZone='UTC'")
    t = {n: f"'{src}/{n}.parquet'" for n in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    )}

    def off(table: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {t[table]}").fetchone()[0]

    o_cust = off("customer", "c_custkey")
    o_supp = off("supplier", "s_suppkey")
    o_part = off("part", "p_partkey")
    o_ord = off("orders", "o_orderkey")
    o_eid = off("events", "event_id")
    o_uid = off("events", "user_id")
    o_doc = off("documents", "doc_id")
    o_vec = off("embeddings", "vec_id")
    o_lab = off("embeddings", "label")

    copies = f"(SELECT unnest(range({k}))::BIGINT AS c)"

    def emit(name: str, select: str) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        con.execute(
            f"COPY ({select}) TO '{path}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{name}: {n} rows -> {path}")

    emit("region", f"SELECT * FROM {t['region']}")
    emit("nation", f"SELECT * FROM {t['nation']}")
    emit(
        "customer",
        f"""SELECT c_custkey + c*{o_cust} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {t['customer']}, {copies}""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + c*{o_supp} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {t['supplier']}, {copies}""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + c*{o_part} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {t['part']}, {copies}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + c*{o_ord} AS o_orderkey,
                   o_custkey + c*{o_cust} AS o_custkey,
                   o_orderstatus, o_totalprice,
                   o_orderdate::TIMESTAMPTZ AS o_orderdate, o_orderpriority
            FROM {t['orders']}, {copies}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + c*{o_ord} AS l_orderkey,
                   l_partkey + c*{o_part} AS l_partkey,
                   l_suppkey + c*{o_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus,
                   l_shipdate::TIMESTAMPTZ AS l_shipdate
            FROM {t['lineitem']}, {copies}""",
    )
    emit(
        "events",
        f"""SELECT event_id + c*{o_eid} AS event_id,
                   epoch_ns(ts) AS ts,
                   user_id + c*{o_uid} AS user_id,
                   event_type, value, props
            FROM {t['events']}, {copies}""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + c*{o_doc} AS doc_id,
                   CASE WHEN c = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1~' || c, 'g')
                   END AS text,
                   lang, source,
                   length(CASE WHEN c = 0 THEN text
                               ELSE regexp_replace(text, '(\\S+)', '\\1~' || c, 'g')
                          END)::BIGINT AS n_chars
            FROM {t['documents']}, {copies}""",
    )
    # rotation is mod the 64-d vector length, so past K=64 copies
    # would repeat bit-identically (copy 0 == copy 64) and plant
    # bogus cross-copy exact-dup neighbors; the second rotation
    # cycle therefore negates the vector — negation preserves norms
    # and every WITHIN-copy cosine (cos(-u,-v)=cos(u,v)) while
    # keeping cross-cycle cosines decorrelated (cos(-u,w)=-cos(u,w)).
    # For K <= 64 the expression reduces to the plain rotation.
    emit(
        "embeddings",
        f"""SELECT vec_id + c*{o_vec} AS vec_id,
                   CASE WHEN (c // 64) % 2 = 1
                        THEN list_transform(
                               embedding[(c % 64 + 1):] || embedding[:(c % 64)],
                               v -> (-v)::FLOAT)::FLOAT[]
                        ELSE (embedding[(c % 64 + 1):] || embedding[:(c % 64)])::FLOAT[]
                   END AS embedding,
                   (label + c*{o_lab})::INTEGER AS label
            FROM {t['embeddings']}, {copies}""",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
