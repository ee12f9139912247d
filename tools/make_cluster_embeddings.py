#!/usr/bin/env python3
"""Generate the committed clustered-embedding fixture for q_ann_recall.

The driver testdata embeddings are uniform-random, where LSH recall is
structurally ~0 (no neighborhood structure to find — VERDICT r3), so the
recall check needs a corpus with real clusters. Deterministic integer-mix
arithmetic only (no numpy / no RNG state), so regeneration is stable across
environments: 16 clusters x 32 vectors, dim 64; vector = cluster center +
small noise. vec_id 0 is a member of cluster 0 and serves as the query.
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
CLUSTERS = 16
PER_CLUSTER = 32
NOISE = 0.12


def mix(h: int) -> int:
    """splitmix-style 64-bit finalizer (public-domain constants)."""
    h &= (1 << 64) - 1
    h = ((h ^ (h >> 33)) * 0xFF51AFD7ED558CCD) & ((1 << 64) - 1)
    h = ((h ^ (h >> 33)) * 0xC4CEB9FE1A85EC53) & ((1 << 64) - 1)
    return h ^ (h >> 33)


def unit(*keys: int) -> float:
    """deterministic uniform [0, 1) from integer keys."""
    h = 0x9E3779B97F4A7C15
    for k in keys:
        h = mix(h ^ (k & ((1 << 64) - 1)))
    return h / float(1 << 64)


centers = [[unit(1, c, j) * 2 - 1 for j in range(DIM)]
           for c in range(CLUSTERS)]

vec_ids, embeddings, labels = [], [], []
for v in range(CLUSTERS * PER_CLUSTER):
    c = v // PER_CLUSTER
    emb = [centers[c][j] + NOISE * (unit(2, v, j) * 2 - 1) for j in range(DIM)]
    vec_ids.append(v)
    embeddings.append(emb)
    labels.append(c)

out = pathlib.Path(__file__).resolve().parent.parent / \
    "src/test/resources/fixtures/dims"
out.mkdir(parents=True, exist_ok=True)
pq.write_table(
    pa.table(
        {"vec_id": vec_ids, "embedding": embeddings, "label": labels},
        schema=pa.schema([
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32())])),
    out / "clustered_embeddings.parquet")
print(f"wrote {out / 'clustered_embeddings.parquet'}: "
      f"{len(vec_ids)} vectors, dim {DIM}, {CLUSTERS} clusters")
