#!/usr/bin/env python3
"""Generate the committed dimension parquet fixtures for the biblio
enrichment / DOI-TTL catalog queries (q_biblio_enrich, q_doi_ttl).

Deterministic formulas only — no randomness — so the files are stable
across regenerations. The dims join documents.source (src0..srcN), with
deliberate partial coverage and NULL holes to exercise the left-join
fill-missing semantics at every scale.
"""
import pathlib
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

out = pathlib.Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/dims"
out.mkdir(parents=True, exist_ok=True)

# biblio dim: 150 sources, NULL holes per-field (reference io_biblio.py dim shape)
n = 150
biblio = {
    "file_key": [f"src{i}" for i in range(n)],
    "b_title": [f"Title {i}" if i % 3 != 0 else None for i in range(n)],
    "b_year": [1990 + (i % 30) if i % 4 != 0 else None for i in range(n)],
    "b_doi": [f"10.1000/j.{i:04d}" if i % 2 == 0 else None for i in range(n)],
    "b_citekey": [f"key{i}" if i % 5 == 0 else None for i in range(n)],
}
pq.write_table(
    pa.table(biblio, schema=pa.schema([
        ("file_key", pa.string()), ("b_title", pa.string()),
        ("b_year", pa.int32()), ("b_doi", pa.string()),
        ("b_citekey", pa.string())])),
    out / "biblio.parquet")

# doi-metadata dim with updated_at dates straddling the TTL cutoff
# (asOf 2026-01-01, ttl 30 days -> cutoff 2025-12-02); every 13th is NULL
m = 200
base = datetime.date(2025, 11, 1)
doi_meta = {
    "file_key": [f"src{i}" for i in range(m)],
    "doi": [f"10.1000/j.{i:04d}" for i in range(m)],
    "updated_at": [None if i % 13 == 0 else base + datetime.timedelta(days=i % 90)
                   for i in range(m)],
}
pq.write_table(
    pa.table(doi_meta, schema=pa.schema([
        ("file_key", pa.string()), ("doi", pa.string()),
        ("updated_at", pa.date32())])),
    out / "doi_meta.parquet")
# Better-BibTeX-style JSON export for the biblio index-source oracle
# (reference io_biblio.py:40-89): edge cases — missing doi, family-only
# author, blank given, blank family (dropped), null pages, no citekey
import json

export = []
for i in range(40):
    authors = []
    if i % 7 != 0:
        authors.append({"family": f"Fam{i}", "given": "" if i % 3 == 0 else f"Giv{i}"})
    if i % 5 == 0:
        authors.append({"family": f"Co{i}", "given": None})
    if i % 11 == 0:
        authors.append({"family": "  ", "given": "Ghost"})  # dropped by the filter
    export.append({
        "pdfFile": f"papers/sub{i % 3}/Doc {i}_v2.pdf",
        "doi": None if i % 4 == 0 else f"10.5555/X.{i:03d}",
        "title": f"Paper Title {i}" if i % 6 != 0 else None,
        "authors": authors,
        "year": 1995 + (i % 25) if i % 8 != 0 else None,
        "pages": None if i % 9 == 0 else {"start": 10 * i + 1, "end": 10 * i + 9},
        "citekey": f"fam{i}key" if i % 2 == 0 else None,
    })
with open(out / "biblio_export.json", "w") as f:
    json.dump(export, f, indent=1)

print("wrote", sorted(p.name for p in out.iterdir()))
