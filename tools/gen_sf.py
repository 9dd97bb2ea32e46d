#!/usr/bin/env python3
"""Scale-up fixture generator for the sf1 robustness probe (VERDICT r10 #1).

Produces a FACTOR-times-larger copy of a driver testdata dir (TESTDATA.md
schema) so graft.Bench can measure how query runtime scales one decade
above the standing bench scale. Tooling only — the engine never reads
this; it exists to manufacture bench INPUTS, exactly like the driver's
own fixture generator.

Two strategies, chosen per table for statistical fidelity:

- Relational/event tables (lineitem, orders, customer, part, supplier,
  events): FACTOR key-shifted copies of the source rows. Every key space
  is dense [0, N), so shifting copy i by i*N preserves all distributions,
  join fan-outs and selectivities bit-for-bit while multiplying
  cardinality. Timestamps keep their window (density scales, range
  doesn't — same as a bigger day of traffic).
- documents / embeddings: FRESH seeded generation matching the source
  distributions (token count U[10,100] over the same 30-word vocab, lang
  and source shares, ~0.16%% planted exact duplicates; unit-norm
  gaussian 64-dim embeddings, uniform labels). Key-shifted text copies
  would be wrong here: identical (or word-permuted) texts across copies
  would hand the dedup/similarity tier artificial 10-way clusters that
  real 10x corpora don't have.
- nation / region: copied unchanged (fixed dimension tables).

Usage: tools/gen_sf.py <src_sf_dir> <out_dir> <factor> [seed]
"""
import sys, json, os
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def n_rows(t):
        return con.execute(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]

    # --- key-shifted replication -------------------------------------
    # (table, [(col, stride_table)]) — stride = source cardinality of the
    # key's own table, so every copy lands in a disjoint dense key range.
    per_tab = {t: n_rows(t) for t in
               ["lineitem", "orders", "customer", "part", "supplier",
                "events", "documents", "embeddings"]}
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{src}/events.parquet'").fetchone()[0]
    shifted = {
        "lineitem": [("l_orderkey", per_tab["orders"]),
                     ("l_partkey", per_tab["part"]),
                     ("l_suppkey", per_tab["supplier"])],
        "orders":   [("o_orderkey", per_tab["orders"]),
                     ("o_custkey", per_tab["customer"])],
        "customer": [("c_custkey", per_tab["customer"])],
        "part":     [("p_partkey", per_tab["part"])],
        "supplier": [("s_suppkey", per_tab["supplier"])],
        "events":   [("event_id", per_tab["events"]),
                     ("user_id", n_users)],
    }
    # Key-shifting is only collision-free if every shifted key lies in
    # [0, stride): a value outside that window would let copy i land on
    # copy j's key range, silently distorting join fan-outs and duplicate
    # rates. (Containment is the safety condition; exact density is not
    # required — a foreign key may legitimately skip parent keys.) Assert
    # loudly per key before any copy is written.
    for tab, keys in shifted.items():
        for col, stride in keys:
            lo, hi = con.execute(
                f"SELECT min({col}), max({col}) FROM '{src}/{tab}.parquet'"
            ).fetchone()
            if lo is None:  # empty source table: min()/max() return NULL
                sys.exit(
                    f"gen_sf: {tab} is empty in {src}; cannot key-shift an "
                    f"empty table. Regenerate the source fixture first.")
            if lo < 0 or hi >= stride:
                sys.exit(
                    f"gen_sf: {tab}.{col} not contained in [0, {stride}): "
                    f"min={lo}, max={hi}. Key-shifted replication would "
                    f"collide; fix the stride or the fixture first.")
    for tab, keys in shifted.items():
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{tab}.parquet'").df()
        strides = dict(keys)
        sel = ", ".join(
            f"CAST({c} + __i * {strides[c]} AS {ty}) AS {c}" if c in strides else c
            for c, ty in zip(cols.column_name, cols.column_type))
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{tab}.parquet' "
            f"CROSS JOIN range({factor}) t(__i) ORDER BY __i) "
            f"TO '{out}/{tab}.parquet' (FORMAT PARQUET)")
        print(f"{tab}: {per_tab[tab]} -> {per_tab[tab] * factor}")

    for tab in ["nation", "region"]:
        con.execute(f"COPY (SELECT * FROM '{src}/{tab}.parquet') "
                    f"TO '{out}/{tab}.parquet' (FORMAT PARQUET)")

    # --- documents: fresh generation ---------------------------------
    rng = np.random.default_rng(seed)
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{src}/documents.parquet' ORDER BY 1").fetchall()]
    langs = con.execute(
        f"SELECT lang, count(*) FROM '{src}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall()
    lang_names = [l for l, _ in langs]
    lang_p = np.array([c for _, c in langs], dtype=float)
    lang_p /= lang_p.sum()
    n_sources = con.execute(
        f"SELECT count(DISTINCT source) FROM '{src}/documents.parquet'").fetchone()[0]
    dup_frac = 1.0 - con.execute(
        f"SELECT count(DISTINCT text) * 1.0 / count(*) "
        f"FROM '{src}/documents.parquet'").fetchone()[0]
    n_docs = per_tab["documents"] * factor
    varr = np.array(vocab, dtype=object)
    lens = rng.integers(10, 101, size=n_docs)
    texts = [" ".join(varr[rng.integers(0, len(varr), size=k)]) for k in lens]
    n_dup = int(round(dup_frac * n_docs))
    for j in rng.integers(0, n_docs, size=n_dup):  # planted exact dups
        texts[j] = texts[int(rng.integers(0, n_docs))]
    doc_tab = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(lang_names, size=n_docs, p=lang_p), pa.string()),
        "source": pa.array([f"src{i}" for i in rng.integers(0, n_sources, size=n_docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(doc_tab, f"{out}/documents.parquet")
    print(f"documents: fresh {n_docs} ({n_dup} planted dups)")

    # --- embeddings: fresh unit-norm gaussians ------------------------
    n_vec = per_tab["embeddings"] * factor
    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
    m = rng.standard_normal((n_vec, dim)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    emb_tab = pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n_vec), pa.int32()),
    })
    pq.write_table(emb_tab, f"{out}/embeddings.parquet")
    print(f"embeddings: fresh {n_vec} x {dim}")
    print(json.dumps({"out": out, "factor": factor, "seed": seed}))

if __name__ == "__main__":
    main()
