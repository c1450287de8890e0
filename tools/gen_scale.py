#!/usr/bin/env python3
"""Scale an existing SF directory up by whole-corpus replication — a
TIMING corpus for scaling measurements (the correctness gate stays on the
driver-provided SFs).

Replication preserves the distributions that drive plan shape while
keeping per-replica structure independent, so data-dependent work scales
LINEARLY the way a genuinely bigger corpus would:

 - relational keys shift per replica (customer/supplier/part/orders/
   lineitem foreign keys move together, so join selectivities are
   unchanged);
 - events keep their time window (4x replicas = 4x traffic in the same
   hours — groups stay, rows per group grow) with ids/users shifted;
 - document TEXT is caesar-shifted per replica (letters rotated by the
   replica index — a character BIJECTION): within a replica every
   gram/shingle overlap relation is preserved EXACTLY (word lengths,
   Jaccard values, duplicate structure — a bijection on characters maps
   gram sets bijectively), across replicas nothing matches — duplicate
   RATE is constant, so near-dup pair counts scale linearly, not
   quadratically. (Naive replication makes every replica pair an exact
   dup and the pair family explodes ~R^2; the first cut of this script
   word-SUFFIXED a replica tag instead, which flooded salted replicas
   with shared tag-straddling char-8-grams and measured d14 at a bogus
   15x under 4x data — the bijection has no such distribution skew);
 - embeddings apply a per-replica SIGNED COORDINATE PERMUTATION (a
   seeded shuffle of the coordinates plus a seeded sign flip each —
   an orthogonal matrix) to the SAME source vectors. Coordinate values
   themselves are copied losslessly, so every intra-replica cosine is
   preserved exactly up to float summation order (≤1e-7 — sign flips
   alone would be bit-exact but leave coordinate-MAGNITUDE profiles
   aligned, measured leaking cross-replica cosines up to 0.71 vs the
   0.51 intra max): per-cell near-dup density, cluster structure, and
   kNN neighborhoods replicate identically, so the per-cell quadratic
   stages of d46/d55/d58/d60 grow the way a genuinely R-times-denser
   corpus would. Cross-replica sims decorrelate like random pairs
   (cosine(v, P·D·w) mixes randomly-signed, randomly-matched
   coordinates), so no replica-pair explosion. (The previous
   fresh-random-vector scheme kept cross sims random too but THINNED
   near-dup density R-fold — the builder-noted caveat that hid the
   quadratic stages' growth.)

events.ts is written as TIMESTAMP_NS: the engine reads the column under
spark.sql.legacy.parquet.nanosAsLong=true and converts nanos itself, so
the scaled file must keep the parquet NANOS physical type of the
originals.

The embedding replication has TWO modes, because the vector families
have two distinct scale directions and each hides the other's cost:

 - default (occupancy growth): replicas keep the ORIGINAL cell labels,
   so per-cell occupancy grows R-fold and the per-cell quadratic
   stages of d46/d55/d58/d60 see ~R^2 pair volume — the densify-stress
   direction (what a corpus whose clusters fill in would do);
 - --remap-labels (cell growth): replicas get label + r*offset, so
   occupancy stays EXACTLY the source's while the cell COUNT grows
   R-fold — the deployment direction (a production corpus re-trains
   its quantizer as it grows, keeping cells bounded), where memory per
   cell is flat and total work is linear in R.

Usage: python3 tools/gen_scale.py <srcSfDir> <outDir> <replicas> [--remap-labels]
"""
import os
import sys

import duckdb


def main() -> None:
    src, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    remap_labels = "--remap-labels" in sys.argv[4:]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def read(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def copy(sql: str, t: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # key offsets: one past the source max, per replica
    off = {}
    for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        off[t] = con.execute(f"SELECT max({k}) + 1 FROM {read(t)}").fetchone()[0]
    umax = con.execute(f"SELECT max(user_id) + 1 FROM {read('events')}").fetchone()[0]

    # small dims copy through unchanged
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {read(t)}", t)

    rng = f"(SELECT unnest(range(0, {reps})) AS r)"

    copy(f"SELECT c_custkey + r * {off['customer']} AS c_custkey, c_name, c_nationkey, "
         f"c_acctbal, c_mktsegment FROM {read('customer')}, {rng}", "customer")
    copy(f"SELECT s_suppkey + r * {off['supplier']} AS s_suppkey, s_name, s_nationkey, "
         f"s_acctbal FROM {read('supplier')}, {rng}", "supplier")
    copy(f"SELECT p_partkey + r * {off['part']} AS p_partkey, p_name, p_brand, p_type, "
         f"p_size, p_retailprice FROM {read('part')}, {rng}", "part")
    copy(f"SELECT o_orderkey + r * {off['orders']} AS o_orderkey, "
         f"o_custkey + r * {off['customer']} AS o_custkey, o_orderstatus, o_totalprice, "
         f"o_orderdate, o_orderpriority FROM {read('orders')}, {rng}", "orders")
    copy(f"SELECT l_orderkey + r * {off['orders']} AS l_orderkey, "
         f"l_partkey + r * {off['part']} AS l_partkey, "
         f"l_suppkey + r * {off['supplier']} AS l_suppkey, "
         f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
         f"l_returnflag, l_linestatus, l_shipdate FROM {read('lineitem')}, {rng}", "lineitem")
    # events go through pyarrow, not DuckDB: DuckDB's parquet reader
    # downcasts the source's TIMESTAMP(NANOS) ts to micros on read, and
    # the engine reads that column as raw nanos (nanosAsLong) — the
    # replica must keep the physical type bit-for-bit
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{src}/events.parquet")
    parts = []
    for r in range(reps):
        parts.append(ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ev.column("event_id"), r * off["events"])
        ).set_column(
            ev.schema.get_field_index("user_id"), "user_id",
            pc.add(ev.column("user_id"), r * umax)))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
    print(f"events: {sum(p.num_rows for p in parts)} rows")
    # replica 0 keeps the original text; others caesar-shift (see module
    # doc). n_chars is length-preserving under a character bijection.
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    def rot(s: str, r: int) -> str:
        return s[r % 26:] + s[:r % 26]
    shift_cases = " ".join(
        f"WHEN {r} THEN translate(text, '{lower + upper}', '{rot(lower, r) + rot(upper, r)}')"
        for r in range(1, reps))
    copy(f"SELECT doc_id + r * {off['documents']} AS doc_id, "
         f"CASE r {shift_cases} ELSE text END AS text, "
         f"lang, source, n_chars "
         f"FROM {read('documents')}, {rng}", "documents")
    # per-replica signed coordinate permutation of the SAME vectors (see
    # module doc): orthogonal => intra-replica cosines preserved,
    # cross-replica sims decorrelated. Permutation/signs are seeded per
    # replica and expanded to explicit per-coordinate SQL.
    import random
    dim = con.execute(f"SELECT len(embedding) FROM {read('embeddings')} LIMIT 1").fetchone()[0]
    def signed_perm_sql(r: int) -> str:
        rnd = random.Random(0xC0FFEE + r)
        perm = list(range(1, dim + 1))  # DuckDB lists are 1-based
        rnd.shuffle(perm)
        coords = ", ".join(
            f"embedding[{p}]" if rnd.random() < 0.5 else f"-embedding[{p}]"
            for p in perm)
        return f"CAST([{coords}] AS FLOAT[])"
    emb_cases = " ".join(
        f"WHEN {r} THEN {signed_perm_sql(r)}" for r in range(1, reps))
    emb_expr = f"CASE r {emb_cases} ELSE embedding END" if reps > 1 else "embedding"
    # label mode (module doc): copied labels grow per-cell occupancy
    # R-fold (densify stress); remapped labels grow the cell COUNT
    # R-fold at the source occupancy (deployment direction)
    if remap_labels:
        lbl_off = con.execute(
            f"SELECT max(label) + 1 FROM {read('embeddings')}").fetchone()[0]
        # empty source: nothing to remap — fall through to the plain copy
        lbl_expr = f"label + r * {lbl_off}" if lbl_off is not None else "label"
    else:
        lbl_expr = "label"
    copy(f"SELECT vec_id + r * {off['embeddings']} AS vec_id, "
         f"{emb_expr} AS embedding, "
         f"{lbl_expr} AS label FROM {read('embeddings')}, {rng}", "embeddings")


if __name__ == "__main__":
    main()
