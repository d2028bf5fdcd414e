#!/usr/bin/env python3
"""Deterministic scale-up of the driver's sf0.1 tables for the sf1 bench.

Usage: python3 scripts/gen_scale.py <srcSfDir> <outDir> [factor=10]

Writes <outDir>/{region,nation,customer,supplier,part,orders,lineitem,
events,documents,embeddings}.parquet at `factor`x the source row counts.
Never touches /root/testdata (read-only driver data).

Method: replica r in [0, factor) shifts every entity key (custkey, suppkey,
partkey, orderkey, event_id, user_id, doc_id, vec_id) by r * SHIFT, so each
replica is a disjoint, referentially-intact shard — joins fan out exactly as
the originals, per-key group sizes stay constant, and keyed-group
cardinality scales with the data (the TPC-H scaling model). nation/region
are fixed dimensions (as in TPC-H). SHIFT = 10,080,000 is divisible by every
modulus the query suite uses (2..10, 20), so `key % m` distributions are
replica-invariant.

Two tables get content mutations so the LLM-pipeline workloads scale the way
real corpora do — more clusters, not bigger clusters:
  - documents: a per-(replica, position) salt token is spliced in every 5
    words. Within a replica the near-dup structure of the source corpus is
    preserved (aligned docs get aligned salts); across replicas the salted
    shingle sets drop Jaccard far below every dedup threshold, so replica
    copies are NOT near-duplicates of each other. Without this, 10x exact
    copies would inflate LSH bucket sizes 10x and candidate pairs 100x — a
    data artifact, not engine scaling.
  - embeddings: each replica adds a deterministic per-component perturbation
    (~±0.1), so ANN neighborhoods stay locally structured instead of
    collapsing into distance-zero stacks.
"""
import os
import sys

import duckdb

SHIFT = 10_080_000  # divisible by 2..10 and 20: key % m is replica-invariant

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def replica_sql(table, src, r):
    s = r * SHIFT
    f = f"'{src}/{table}.parquet'"
    if table in ("region", "nation"):  # fixed dims — emit once
        return f"SELECT * FROM {f}" if r == 0 else None
    if table == "customer":
        return f"SELECT c_custkey + {s} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM {f}"
    if table == "supplier":
        return f"SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {f}"
    if table == "part":
        return f"SELECT p_partkey + {s} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM {f}"
    if table == "orders":
        return (f"SELECT o_orderkey + {s} AS o_orderkey, o_custkey + {s} AS o_custkey, "
                f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {f}")
    if table == "lineitem":
        return (f"SELECT l_orderkey + {s} AS l_orderkey, l_partkey + {s} AS l_partkey, "
                f"l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {f}")
    if table == "events":
        return (f"SELECT event_id + {s} AS event_id, ts, user_id + {s} AS user_id, "
                f"event_type, value, props FROM {f}")
    if table == "documents":
        if r == 0:
            return f"SELECT * FROM {f}"
        # splice a per-(replica, position) salt token every 5 words:
        # in-replica near-dup alignment preserved, cross-replica Jaccard
        # collapses below every dedup threshold
        return (f"SELECT doc_id + {s} AS doc_id, "
                f"list_reduce(list_transform(string_split(text, ' '), "
                f"(w, i) -> CASE WHEN i % 5 = 0 THEN w || ' zr{r}p' || CAST(i AS VARCHAR) "
                f"ELSE w END), (a, b) -> a || ' ' || b) AS text, "
                f"lang, source, n_chars FROM {f}")
    if table == "embeddings":
        if r == 0:
            return f"SELECT * FROM {f}"
        # per-replica SIGNED STRIDE PERMUTATION of the 64 components — an
        # exact isometry, so every replica's internal near-dup/ANN
        # structure is identical to the original (more clusters, not
        # bigger ones), while cross-replica cosines drop to ~N(0, 1/8),
        # far below every similarity threshold in the suite. The previous
        # +-0.1 jitter left replica twins at cos ~0.99: dd5's candidate
        # pairs then grew QUADRATICALLY in the replica count (52k pairs at
        # sf1, 479k at sf3) — a fixture artifact, not engine scaling.
        p = 2 * r + 3  # odd => bijection mod 64
        return (f"SELECT vec_id + {s} AS vec_id, "
                f"list_transform(range(0, 64), i -> "
                f"CAST(CASE WHEN hash(i * 7919 + {r} * 104729) % 2 = 0 "
                f"THEN 1 ELSE -1 END AS FLOAT) * "
                f"embedding[((i * {p} + {r}) % 64) + 1]) "
                f"AS embedding, label FROM {f}")
    raise ValueError(table)


def main(src, out, factor=10, only=None):
    """`only`: optional subset of tables to replicate at `factor`; the rest
    are emitted at 1x (one replica). Used for the dedup/ANN scale curve —
    sf3 scales documents/embeddings 30x while the relational tables stay
    1x, so the corpus fits in RAM without a 30x lineitem riding along."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=16")
    for t in TABLES:
        fac = factor if (only is None or t in only) else 1
        legs = [q for q in (replica_sql(t, src, r) for r in range(fac)) if q]
        union = " UNION ALL ".join(legs)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
