#!/usr/bin/env python3
"""Synthesize a scratch ~sfN dataset as K id-shifted copies of sf0.1
(round-19 scaling-curve probe; the VERDICT r18 "measure the 100x
claim" directive). /root/testdata is never touched — output goes to a
scratch dir the caller names.

Usage: python3 tools/synth_scale.py <src_sf_dir> <out_dir> <K>

Design notes (why not verbatim copies):
- Entity keys (doc_id, vec_id, event_id, user_id, and the whole TPC-H
  key web) shift by copy*1e8, consistently across tables, so the K
  copies are DISJOINT: joins/graphs/sessions scale by volume, not by
  artificial key collisions.
- Document TEXT is perturbed per copy (a copy-specific marker token
  inserted every 3 words, copy 0 verbatim): verbatim copies would make
  every doc a K-way cross-copy near-duplicate — LSH buckets would grow
  K-fold and pair enumeration K^2-fold, a data regime no real 10x
  corpus has (dup RATE is scale-invariant; K identical copies push it
  to (K-1)/K). The marker touches ~half the char-8 shingles, putting
  cross-copy Jaccard ~0.33 — far below the LSH band threshold — while
  WITHIN-copy duplicate structure is preserved exactly (identical
  texts perturb identically). n_chars is recomputed to keep the
  n_chars == length(text) invariant.
- EMBEDDINGS rotate component-wise by (copy*7) mod dim: norms and the
  within-copy geometry are exactly preserved, while a rotated copy of
  a random-ish vector is ~orthogonal to the original, so cross-copy
  ANN/SemDeDup candidates do not explode.
- nation/region (true dimensions) stay single-copy; every other table
  is K copies.
"""
import os
import sys

import duckdb


def main():
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    shift = 100_000_000

    copies = ",".join(str(i) for i in range(k))

    def write(name, sql):
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("nation", "region"):
        write(t, f"SELECT * FROM '{src}/{t}.parquet'")

    # Marker insertion: '((?:\S+\s+){3})' -> '\1zq<c>x ' with the 'g'
    # flag; copy 0 is verbatim so sf0.1 is an exact subset.
    write("documents", f"""
        SELECT doc_id + CAST(c AS BIGINT)*{shift} AS doc_id,
               CASE WHEN c = 0 THEN text
                    ELSE regexp_replace(text, '((?:\\S+\\s+){{3}})',
                                        '\\1zq' || c || 'x ', 'g') END AS text,
               lang, source,
               CASE WHEN c = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '((?:\\S+\\s+){{3}})',
                                        '\\1zq' || c || 'x ', 'g')) END AS n_chars
        FROM '{src}/documents.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("embeddings", f"""
        SELECT vec_id + CAST(c AS BIGINT)*{shift} AS vec_id,
               CASE WHEN c = 0 THEN embedding
                    ELSE list_concat(embedding[(c*7) % len(embedding) + 1:],
                                     embedding[1:(c*7) % len(embedding)])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("events", f"""
        SELECT event_id + CAST(c AS BIGINT)*{shift} AS event_id, ts,
               user_id + CAST(c AS BIGINT)*{shift} AS user_id, event_type, value, props
        FROM '{src}/events.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("customer", f"""
        SELECT c_custkey + CAST(c AS BIGINT)*{shift} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("supplier", f"""
        SELECT s_suppkey + CAST(c AS BIGINT)*{shift} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("part", f"""
        SELECT p_partkey + CAST(c AS BIGINT)*{shift} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{src}/part.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("orders", f"""
        SELECT o_orderkey + CAST(c AS BIGINT)*{shift} AS o_orderkey,
               o_custkey + CAST(c AS BIGINT)*{shift} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', (SELECT unnest([{copies}]) AS c)""")

    write("lineitem", f"""
        SELECT l_orderkey + CAST(c AS BIGINT)*{shift} AS l_orderkey,
               l_partkey + CAST(c AS BIGINT)*{shift} AS l_partkey,
               l_suppkey + CAST(c AS BIGINT)*{shift} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', (SELECT unnest([{copies}]) AS c)""")


if __name__ == "__main__":
    main()
