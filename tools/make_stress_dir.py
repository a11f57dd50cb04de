"""Build a 10x stress tier for the curation/text gates (round-3 verdict
item 8: the curation ops gated at 500-doc sf0.01 corpora need a larger
sweep row; the driver ships no sf1 data, so we synthesize one inside the
repo).

Creates ``.stress-sf1/`` next to the repo root with:
- documents.parquet/ — sf0.1 documents replicated REPLICAS times; copy j
  gets doc_id + j*stride and a per-copy text prefix so values (tf-idf,
  chunk dedup, quality stats) are not trivially identical across copies.
  Written as a DIRECTORY of N_FILES part files (round-4 verdict item 5:
  a single file caps Spark scan parallelism at its row groups — 2 of 32
  cores — which confounded the 10x scaling table);
- embeddings.parquet/ — sf0.1 embeddings replicated the same way with a
  deterministic per-copy perturbation on the first dimension, same
  multi-file layout;
- symlinks to the sf0.1 parquet for every other table, so
  ``tools/check_oracle.py .stress-sf1 <gates...>`` runs unchanged
  (check_oracle globs directory tables for DuckDB).

Usage: python tools/make_stress_dir.py [out_dir] [replicas] [n_files]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stress-sf1"
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.makedirs(out, exist_ok=True)

    def write_split(table: pa.Table, path: str) -> None:
        """Write as a directory of n_files part files (Spark-style layout)."""
        import shutil

        if os.path.lexists(path):
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        os.makedirs(path)
        n = table.num_rows
        step = (n + n_files - 1) // n_files
        for i in range(n_files):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = np.asarray(docs.column("doc_id"))
    stride = int(ids.max()) + 1
    parts = []
    for j in range(replicas):
        t = docs
        new_ids = pa.array(ids + j * stride)
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", new_ids)
        if j:
            texts = pa.array([f"v{j} {s}" for s in t.column("text").to_pylist()])
            t = t.set_column(t.schema.get_field_index("text"), "text", texts)
        parts.append(t)
    big_docs = pa.concat_tables(parts)
    write_split(big_docs, os.path.join(out, "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vids = np.asarray(emb.column("vec_id"))
    vstride = int(vids.max()) + 1
    eparts = []
    for j in range(replicas):
        t = emb
        t = t.set_column(
            t.schema.get_field_index("vec_id"), "vec_id", pa.array(vids + j * vstride)
        )
        if j:
            vecs = [
                [v[0] + j * 1e-3] + v[1:]
                for v in (list(map(float, x)) for x in t.column("embedding").to_pylist())
            ]
            t = t.set_column(
                t.schema.get_field_index("embedding"),
                "embedding",
                pa.array(vecs, type=emb.schema.field("embedding").type),
            )
        eparts.append(t)
    write_split(pa.concat_tables(eparts), os.path.join(out, "embeddings.parquet"))

    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print(f"stress dir ready: {out} (documents x{replicas} = {big_docs.num_rows} rows, {n_files} files/table)")


if __name__ == "__main__":
    main()
