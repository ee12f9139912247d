#!/usr/bin/env python3
"""Generate independent oracle fixtures for the catalog queries whose
semantics DuckDB SQL cannot express (backref regexes, difflib, the full
fusion pipeline): q_chunker, q_quality_gate, q_simhash, q_search_topk.

q_chunker / q_quality_gate / q_search_topk RUN THE REFERENCE implementation
at /root/reference (same stubbing approach as make_goldens.py) over the
driver's testdata `documents` tables — a true second-engine oracle.
q_simhash mirrors graft.ops.TextOps.simhash64 in independent Python.

Output: src/test/resources/fixtures/sf{0.001,0.01,0.1}/<query>.parquet.
The oracle SQL selects the right fixture by the corpus signature
(sum(n_chars) of the documents view), so one static SQL string works at
every scale the driver runs.
"""
import math
import os
import sys
import types
import hashlib

sys.path.insert(0, "/root/reference")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb


class BM25Okapi:
    """Public rank_bm25 v0.2.2 BM25Okapi semantics (same stub as make_goldens)."""

    def __init__(self, corpus, tokenizer=None, k1=1.5, b=0.75, epsilon=0.25):
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = 0
        self.avgdl = 0
        self.doc_freqs = []
        self.idf = {}
        self.doc_len = []
        nd = {}
        num_doc = 0
        for document in corpus:
            self.doc_len.append(len(document))
            num_doc += len(document)
            frequencies = {}
            for word in document:
                frequencies[word] = frequencies.get(word, 0) + 1
            self.doc_freqs.append(frequencies)
            for word in frequencies:
                nd[word] = nd.get(word, 0) + 1
            self.corpus_size += 1
        self.avgdl = num_doc / self.corpus_size
        idf_sum = 0.0
        negative_idfs = []
        for word, freq in nd.items():
            idf = math.log(self.corpus_size - freq + 0.5) - math.log(freq + 0.5)
            self.idf[word] = idf
            idf_sum += idf
            if idf < 0:
                negative_idfs.append(word)
        self.average_idf = idf_sum / len(self.idf) if self.idf else 0.0
        eps = self.epsilon * self.average_idf
        for word in negative_idfs:
            self.idf[word] = eps

    def get_scores(self, query):
        score = np.zeros(self.corpus_size)
        doc_len = np.array(self.doc_len)
        for q in query:
            q_freq = np.array([(doc.get(q) or 0) for doc in self.doc_freqs])
            score += (self.idf.get(q) or 0) * (
                q_freq * (self.k1 + 1)
                / (q_freq + self.k1 * (1 - self.b + self.b * doc_len / self.avgdl))
            )
        return score


rank_bm25_mod = types.ModuleType("rank_bm25")
rank_bm25_mod.BM25Okapi = BM25Okapi
sys.modules["rank_bm25"] = rank_bm25_mod
for missing in ("fitz", "httpx", "yaml", "tqdm"):
    if missing not in sys.modules:
        try:
            __import__(missing)
        except ImportError:
            mod = types.ModuleType(missing)
            if missing == "tqdm":
                mod.tqdm = lambda x, **kw: x
            if missing == "httpx":
                mod.AsyncClient = type("AsyncClient", (), {})
                mod.Response = type("Response", (), {})
                mod.HTTPError = type("HTTPError", (Exception,), {})
            sys.modules[missing] = mod

from lightweight_rag import io_pdf, index as ref_index, performance, scoring  # noqa: E402
from lightweight_rag.models import Chunk, DocMeta  # noqa: E402
from lightweight_rag.main import search_topk  # noqa: E402
from lightweight_rag.config import get_default_config  # noqa: E402

QSTRING = "spark hash join scan"  # SparkEntry's fixed reference query
# >= 20 chars so the difflib fuzzy path is active (scoring.py:197)
FUZZY_QUERY = "partition strategies for distributed query engines"
OUT_BASE = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources", "fixtures")


def simhash64(tokens):
    """Mirror of graft.ops.TextOps.simhash64: per-token 64-bit hash = first
    8 md5 bytes big-endian; bit-majority vote; hex-formatted 64-bit word.
    """
    v = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        for b in range(64):
            if (h >> b) & 1:
                v[b] += 1
            else:
                v[b] -= 1
    out = 0
    for b in range(64):
        if v[b] > 0:
            out |= 1 << b
    return "%016x" % out


def run_sf(sf_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id").fetchall()

    # ---- q_chunker: reference clean_text + chunk_text(sliding 300/50) ----
    ch = {"doc_id": [], "chunk_idx": [], "chunk_len": [], "chunk_head": []}
    for doc_id, text, _ in rows:
        cleaned = io_pdf.clean_text(text)
        pieces = io_pdf.chunk_text(cleaned, "", {
            "page_split": "sliding", "window_chars": 300, "overlap_chars": 50})
        for i, piece in enumerate(pieces):
            ch["doc_id"].append(doc_id)
            ch["chunk_idx"].append(i)
            ch["chunk_len"].append(len(piece))
            ch["chunk_head"].append(piece[:60])
    pq.write_table(pa.table(ch), f"{out_dir}/q_chunker.parquet")

    # ---- q_normalize: reference clean_text/normalize_text (the
    #      byte-identical-text invariant, oracle-checked) ----
    nm = {"doc_id": [], "clean_len": [], "clean_md5": [], "norm_md5": []}
    for doc_id, text, _ in rows:
        cleaned = io_pdf.clean_text(text)
        normed = io_pdf.normalize_text(text)
        nm["doc_id"].append(doc_id)
        nm["clean_len"].append(len(cleaned))
        nm["clean_md5"].append(hashlib.md5(cleaned.encode("utf-8")).hexdigest())
        nm["norm_md5"].append(hashlib.md5(normed.encode("utf-8")).hexdigest())
    pq.write_table(pa.table(nm), f"{out_dir}/q_normalize.parquet")

    # ---- q_sentences: reference split_into_sentences ----
    sn = {"doc_id": [], "n_sentences": [], "first_len": [], "sent_md5": []}
    for doc_id, text, _ in rows:
        sents = io_pdf.split_into_sentences(text)
        sn["doc_id"].append(doc_id)
        sn["n_sentences"].append(len(sents))
        sn["first_len"].append(len(sents[0]) if sents else 0)
        sn["sent_md5"].append(
            hashlib.md5("\x1f".join(sents).encode("utf-8")).hexdigest())
    pq.write_table(pa.table(sn), f"{out_dir}/q_sentences.parquet")

    # ---- q_gibberish: reference gibberish_penalty ----
    gb = {"doc_id": [r[0] for r in rows],
          "gibberish": [round(scoring.gibberish_penalty(r[1], 0.20), 6) for r in rows]}
    pq.write_table(pa.table(gb), f"{out_dir}/q_gibberish.parquet")

    # ---- q_fuzzy_bonus: reference difflib fuzzy_match_bonus ----
    fz = {"doc_id": [r[0] for r in rows],
          "fuzzy": [round(scoring.fuzzy_match_bonus(r[1], FUZZY_QUERY, 20), 6)
                    for r in rows]}
    pq.write_table(pa.table(fz), f"{out_dir}/q_fuzzy_bonus.parquet")

    # ---- q_quality_gate: reference is_text_quality_good(text, 0.5) ----
    qg = {"doc_id": [r[0] for r in rows],
          "quality_ok": [bool(io_pdf.is_text_quality_good(r[1], 0.5)) for r in rows]}
    pq.write_table(pa.table(qg), f"{out_dir}/q_quality_gate.parquet")

    # ---- q_simhash: independent python mirror ----
    sh = {"doc_id": [r[0] for r in rows],
          "simhash": [simhash64(ref_index.tokenize(r[1])) for r in rows]}
    pq.write_table(pa.table(sh), f"{out_dir}/q_simhash.parquet")

    # ---- q_search_topk: the full reference fusion pipeline ----
    # corpus order = the engine's deterministic tie order (source, page,
    # chunkIdx=doc_id); one document row = one chunk (DocIndex model)
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    sources = {s: i for i, s in enumerate(sorted({r[2] for r in rows}))}
    chunks = [Chunk(doc_id=sources[src], source=src, page=1, text=text,
                    meta=DocMeta(title=None, authors=[], year=None, doi=None,
                                 source=src))
              for (doc_id, text, src) in ordered]
    cfg = get_default_config()
    tokenized = [ref_index.tokenize(c.text) for c in chunks]
    bm25 = BM25Okapi(tokenized, k1=cfg["bm25"]["k1"], b=cfg["bm25"]["b"])
    results, _confidence = search_topk(
        corpus=chunks, bm25=bm25, tokenized=tokenized, query=QSTRING,
        k=cfg["rerank"]["final_top_k"],
        prox_window=cfg["bonuses"]["proximity"]["window"],
        prox_lambda=cfg["bonuses"]["proximity"]["weight"],
        ngram_lambda=cfg["bonuses"]["ngram"]["weight"],
        diversity=cfg["diversity"]["enabled"],
        div_lambda=cfg["diversity"]["per_doc_penalty"],
        max_per_doc=cfg["diversity"]["max_per_doc"],
        semantic=False,
        max_snippet_chars=cfg["output"]["max_snippet_chars"],
        include_scores=True,
        include_pandoc_cite=cfg["citations"]["include_pandoc_cite"],
        use_pandoc_as_primary=cfg["citations"]["pandoc_as_primary"],
        fusion_config=cfg,
        prf_config=dict(cfg["prf"], enabled=False),
        mmr_config=cfg["diversity"]["mmr"],
        heuristic_config=cfg["rerank"]["heuristic"],
    )
    results = performance.sort_results_deterministically(results)
    pq.write_table(pa.table({
        "level": [_confidence["level"]],
        "score": [float(_confidence["score"])],
        "spread": [float(_confidence["spread"])],
        "stability": [float(_confidence["stability"])],
    }), f"{out_dir}/q_search_confidence.parquet")
    st = {"rank": [], "source": [], "score": [], "snippet": []}
    for i, r in enumerate(results[:cfg["rerank"]["final_top_k"]]):
        st["rank"].append(i + 1)
        st["source"].append(r["source"]["file"])
        st["score"].append(float(r["score"]))
        st["snippet"].append(r["text"][:80])
    pq.write_table(pa.table(st), f"{out_dir}/q_search_topk.parquet")
    print(f"{sf_dir}: chunker={len(ch['doc_id'])} rows, topk={len(st['rank'])} rows")


if __name__ == "__main__":
    for sf in ("0.001", "0.01", "0.1"):
        run_sf(f"/root/testdata/sf{sf}", os.path.join(OUT_BASE, f"sf{sf}"))
