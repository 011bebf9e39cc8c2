"""Regenerate a deterministic sf1-scale bench tier from the sf0.1 testdata.

The driver's own sf1.0 directory is transient between sessions; this script
rebuilds an equivalent tier (seed 42) so before/after bench pairs at the
driver's escalated scale stay like-for-like:

- relational tables (customer/orders/lineitem/part/supplier/events) are the
  sf0.1 tables tiled 10x with join-key offsets, so join fan-out and value
  distributions are preserved exactly; nation/region are copied (dimensions);
- documents and embeddings are fresh draws from the observed sf0.1
  distributions (tiling would plant exact duplicates and distort the
  dedup/ANN workloads): documents sample the observed vocabulary/length/lang
  marginals, embeddings are unit-norm random vectors with the observed label
  marginal (the sf0.1 labels carry no cluster structure - verified:
  within-label cosine ~= between-label cosine ~= 0).

Usage: python scripts/gen_benchdata.py [OUT_DIR] [TILE]
       (defaults: /tmp/benchdata/sf1.0, tile 10 — tile 30 ~= an sf3 tier)

This is a measurement aid only - bench.py itself is frozen and reads
SPARK_GRAFT_SF_DIR; nothing in the engine references this script.
"""

from __future__ import annotations

import collections
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/benchdata/sf1.0")
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 42


def write(name: str, table: pa.Table) -> None:
    # Mirror the driver layout: one file; row groups come out in the same
    # ~10x-row single-group shape the driver produced at sf1 for the small
    # tables and a handful of groups for lineitem.
    pq.write_table(table, OUT / f"{name}.parquet", compression="snappy",
                   row_group_size=1_000_000)
    m = pq.ParquetFile(OUT / f"{name}.parquet").metadata
    print(f"{name}: {m.num_rows} rows, {m.num_row_groups} row groups")


def tile_table(name: str, key_cols: dict[str, int]) -> None:
    """Tile a table TILE times; key_cols maps column -> per-replica offset."""
    t = pq.read_table(SRC / f"{name}.parquet")
    reps = []
    for i in range(TILE):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in key_cols and i > 0:
                off = pa.scalar(i * key_cols[field.name], type=field.type)
                import pyarrow.compute as pc
                col = pc.add(col, off)
            cols.append(col)
        reps.append(pa.table(cols, schema=t.schema))
    write(name, pa.concat_tables(reps))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # --- dimensions: copy verbatim ---
    for name in ("nation", "region"):
        write(name, pq.read_table(SRC / f"{name}.parquet"))

    # offsets = max key + 1 on the sf0.1 tier, shared across tables so
    # foreign keys keep resolving within each replica
    import pyarrow.compute as pc
    def max1(name, col):
        return pc.max(pq.read_table(SRC / f"{name}.parquet").column(col)).as_py() + 1

    o_cust = max1("customer", "c_custkey")
    o_order = max1("orders", "o_orderkey")
    o_part = max1("part", "p_partkey")
    o_supp = max1("supplier", "s_suppkey")
    o_event = max1("events", "event_id")
    o_user = max1("events", "user_id")

    tile_table("customer", {"c_custkey": o_cust})
    tile_table("supplier", {"s_suppkey": o_supp})
    tile_table("part", {"p_partkey": o_part})
    tile_table("orders", {"o_orderkey": o_order, "o_custkey": o_cust})
    tile_table("lineitem", {"l_orderkey": o_order, "l_partkey": o_part,
                            "l_suppkey": o_supp})
    tile_table("events", {"event_id": o_event, "user_id": o_user})

    # --- documents: fresh draws from observed marginals ---
    d = pq.read_table(SRC / "documents.parquet").to_pandas()
    vocab_counts = collections.Counter()
    for txt in d.text:
        vocab_counts.update(txt.split(" "))
    words = np.array(sorted(vocab_counts))
    wprob = np.array([vocab_counts[w] for w in words], dtype=float)
    wprob /= wprob.sum()
    nword_obs = d.text.str.count(" ").to_numpy() + 1
    langs, lcounts = np.unique(d.lang.to_numpy(), return_counts=True)
    lprob = lcounts / lcounts.sum()

    n_docs = len(d) * TILE
    nw = rng.choice(nword_obs, size=n_docs, replace=True)
    total = int(nw.sum())
    flat = rng.choice(words, size=total, p=wprob)
    offs = np.concatenate(([0], np.cumsum(nw)))
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    doc_tab = pa.table({
        "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(rng.choice(langs, size=n_docs, p=lprob), type=pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)], type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    write("documents", doc_tab)

    # --- embeddings: unit-norm draws, observed label marginal ---
    e = pq.read_table(SRC / "embeddings.parquet").to_pandas()
    dim = len(e.embedding.iloc[0])
    n_vec = len(e) * TILE
    M = rng.standard_normal((n_vec, dim)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    labels_u, lab_counts = np.unique(e.label.to_numpy(), return_counts=True)
    lab_p = lab_counts / lab_counts.sum()
    emb_tab = pa.table({
        "vec_id": pa.array(np.arange(n_vec), type=pa.int64()),
        "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
        "label": pa.array(rng.choice(labels_u, size=n_vec, p=lab_p).astype(np.int32),
                          type=pa.int32()),
    })
    write("embeddings", emb_tab)

    (OUT / "_DONE").touch()
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()
