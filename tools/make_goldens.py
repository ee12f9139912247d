#!/usr/bin/env python3
"""Generate golden test vectors by RUNNING the reference implementation
(/root/reference, read-only) on deterministic synthetic inputs.

The goldens freeze the reference's observable behavior; the Scala engine's
parity suite asserts byte/rank/score-identical results against them.

rank_bm25 is not installed in the sandbox; we inject a faithful stand-in of
the public BM25Okapi (v0.2.2 formulas: idf = ln(N-df+0.5)-ln(df+0.5) with
epsilon*mean-idf flooring of negative idfs) so the reference code paths run
unmodified.
"""
import json
import math
import os
import random
import sys
import types

sys.path.insert(0, "/root/reference")

# ---- stub unavailable third-party deps before importing the reference ----
import numpy as np


class BM25Okapi:
    """Public rank_bm25 v0.2.2 BM25Okapi semantics."""

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

from lightweight_rag import io_pdf, scoring, index as ref_index, fusion, prf, diversity, performance  # noqa: E402
from lightweight_rag.models import Chunk, DocMeta  # noqa: E402
from lightweight_rag.main import search_topk, calibrate_confidence  # noqa: E402
from lightweight_rag.config import get_default_config  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "goldens")
os.makedirs(OUT, exist_ok=True)


def dump(name, obj):
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1, ensure_ascii=False)
    print("wrote", name)


# ---------------------------------------------------------------------------
# 1. Text-function vectors
# ---------------------------------------------------------------------------
WORDS = (
    "retrieval index spark shuffle partition engine ranking corpus token "
    "stopword analyzer document query search score fusion window sentence "
    "neural network training gradient transformer attention embedding vector "
    "crawl web page html parser extract nobel prize physics quantum theory "
    "climate model ocean temperature satellite measurement experiment"
).split()

rng = random.Random(42)

tricky_texts = [
    "",
    "Hello,   world!\nThis is a test.",
    "soft­hyphen and hy-\nphenation joined",
    "ligature ﬁle and fullｗidth chars ＡＢ",
    "Dr. Smith met Mr. Jones e.g. at 5 p.m. vs. the others. Next sentence here!",
    "Multiple   spaces\t\tand\nnewlines   nbsp",
    "control\x00chars\x07here\x1fgone",
    "aaaaa bbbbbbb ccccc normal text here with common letters",
    "10.1234/abcd.efg123] trailing punct",
    "Short.",
    "word " * 200,
    "The quick brown fox jumps over the lazy dog. " * 30,
    "A sentence about machine learning algorithms and neural networks. "
    "Another one about gradient descent optimization methods! "
    "A third regarding transformer attention mechanisms? " * 5,
]
# add seeded pseudo-web texts
for i in range(12):
    n = rng.randint(30, 300)
    toks = [rng.choice(WORDS) for _ in range(n)]
    parts = []
    for j, t in enumerate(toks):
        parts.append(t)
        if rng.random() < 0.12:
            parts[-1] += rng.choice([".", "!", "?", ","])
    tricky_texts.append(" ".join(parts))

text_vectors = []
for t in tricky_texts:
    text_vectors.append({
        "input": t,
        "clean_text": io_pdf.clean_text(t),
        "normalize_text": io_pdf.normalize_text(t),
        "quality_07": io_pdf.is_text_quality_good(t, 0.7),
        "quality_05": io_pdf.is_text_quality_good(t, 0.5),
        "sentences": io_pdf.split_into_sentences(t),
        "sliding_300_50": io_pdf.create_sliding_windows(t, 300, 50),
        "sliding_600_80": io_pdf.create_sliding_windows(t, 600, 80),
        "tokenize": ref_index.tokenize(t),
        "tokenize_rerank": __import__("lightweight_rag.rerank", fromlist=["x"]).tokenize_for_rerank(t),
        "robustify": fusion.robustify_query(t),
        "dedup_md5": __import__("hashlib").md5(
            __import__("re").sub(r"\W+", "", t.lower()).encode()).hexdigest(),
        "window_snippet_50": __import__("lightweight_rag.models", fromlist=["x"]).window(t, 50),
    })
dump("text_vectors.json", text_vectors)

# ---------------------------------------------------------------------------
# 2. Bonus-function vectors
# ---------------------------------------------------------------------------
queries = [
    "machine learning algorithms",
    "quick brown fox",
    "gradient descent optimization methods for neural networks training",
    "the of and",
    "transformer attention mechanisms are the core of modern neural networks today",
    '"Deep Learning, Neural-Networks!"',
    "climate ocean temperature",
    "nobel prize physics",
    "spark shuffle partition",
    "zzzqqqxyz nonexistent tokens",
]
bonus_vectors = []
for t in tricky_texts:
    for q in queries[:6]:
        qt = ref_index.tokenize(q)
        bonus_vectors.append({
            "text": t, "query": q,
            "proximity_30": scoring.proximity_bonus(t, qt, 30),
            "proximity_24": scoring.proximity_bonus(t, qt, 24),
            "ngram": scoring.ngram_bonus(t, q),
            "pattern": scoring.pattern_bonus(t),
            "metadata_none": scoring.metadata_bonus(t, None),
            "metadata_title": scoring.metadata_bonus(t, "Machine Learning Algorithms"),
            "gibberish": scoring.gibberish_penalty(t, 0.20),
            "fuzzy": scoring.fuzzy_match_bonus(t, q, 20),
        })
dump("bonus_vectors.json", bonus_vectors)

# ---------------------------------------------------------------------------
# 3. Full-pipeline goldens over a synthetic corpus
# ---------------------------------------------------------------------------
rng2 = random.Random(7)
docs = []
ANSWERY = [" is a ", " we propose ", " consists of ", " we argue "]
for d in range(24):
    pages = []
    for p in range(rng2.randint(1, 4)):
        n = rng2.randint(60, 220)
        toks = [rng2.choice(WORDS) for _ in range(n)]
        s = []
        for j, t in enumerate(toks):
            s.append(t)
            if rng2.random() < 0.1:
                s[-1] += "."
        text = " ".join(s)
        if rng2.random() < 0.3:
            text = "Abstract " + text
        if rng2.random() < 0.4:
            k = rng2.randint(0, max(0, len(text) - 1))
            text = text[:k] + rng2.choice(ANSWERY) + text[k:]
        if rng2.random() < 0.25:
            text += " the quick brown fox jumps over the lazy dog near the river bank"
        if rng2.random() < 0.2:
            text += " machine learning algorithms for neural networks"
        if d == 20:
            # gibberish-heavy page
            text = "1480 1481 1482 doi:10.1111/j.1467 10x 3x p15q77 !!! ??? " * 8 + text[:100]
        pages.append(text)
    docs.append(pages)

# chunk exactly as the reference does (chunk_text with sliding 600/80), then
# dedup (io_pdf.deduplicate_chunks) to get the corpus
chunks = []
for d, pages in enumerate(docs):
    title = f"Paper {d}" if d % 3 == 0 else None
    for p, text in enumerate(pages, start=1):
        cleaned = io_pdf.clean_text(text)
        for piece in io_pdf.chunk_text(cleaned, "", {"page_split": "sliding",
                                                     "window_chars": 600,
                                                     "overlap_chars": 80}):
            meta = DocMeta(
                title=title,
                authors=([f"Author{d}, A."] if d % 2 == 0 else []),
                year=(2000 + d) if d % 4 != 1 else None,
                doi=(f"10.1000/doc{d}" if d % 5 == 0 else None),
                source=f"site{d:03d}.pdf",
                start_page=(100 if d % 6 == 0 else None),
                citekey=(f"key{d}" if d % 3 == 0 else None),
            )
            chunks.append(Chunk(doc_id=d, source=f"site{d:03d}.pdf", page=p,
                                text=piece, meta=meta))

chunks = io_pdf.deduplicate_chunks(chunks)

cfg = get_default_config()
k1, b = cfg["bm25"]["k1"], cfg["bm25"]["b"]
tokenized = [ref_index.tokenize(c.text) for c in chunks]
bm25 = BM25Okapi(tokenized, k1=k1, b=b)

corpus_dump = [{
    "chunk_id": i, "doc_id": c.doc_id, "source": c.source, "page": c.page,
    "text": c.text,
    "title": c.meta.title, "authors": c.meta.authors, "year": c.meta.year,
    "doi": c.meta.doi, "start_page": c.meta.start_page, "citekey": c.meta.citekey,
} for i, c in enumerate(chunks)]
dump("corpus.json", {
    "pages": [{"doc_id": d, "page": p + 1, "text": t, "source": f"site{d:03d}.pdf"}
              for d, pages in enumerate(docs) for p, t in enumerate(pages)],
    "chunks": corpus_dump,
    "k1": k1, "b": b,
    "n_docs": bm25.corpus_size, "avgdl": bm25.avgdl,
    "average_idf": bm25.average_idf,
    "idf": {t: v for t, v in sorted(bm25.idf.items())},
})

pipeline_goldens = []
for qi, q in enumerate(queries):
    prf_enabled = (qi == 7)
    prf_cfg = dict(cfg["prf"], enabled=prf_enabled)
    base_scores = bm25.get_scores(ref_index.tokenize(q))
    results, confidence = search_topk(
        corpus=chunks, bm25=bm25, tokenized=tokenized, query=q,
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
        prf_config=prf_cfg,
        mmr_config=cfg["diversity"]["mmr"],
        heuristic_config=cfg["rerank"]["heuristic"],
    )
    results = performance.sort_results_deterministically(results)

    # expose internals for stage-level parity
    q_tokens = ref_index.tokenize(q)
    scores = [float(s) for s in base_scores]
    for i, chunk in enumerate(chunks):
        pb = scoring.proximity_bonus(chunk.text, q_tokens, window_size=cfg["bonuses"]["proximity"]["window"])
        if pb:
            scores[i] += cfg["bonuses"]["proximity"]["weight"] * pb
        nb = scoring.ngram_bonus(chunk.text, q)
        if nb:
            scores[i] += cfg["bonuses"]["ngram"]["weight"] * nb
        scores[i] += scoring.pattern_bonus(chunk.text)
        scores[i] += scoring.metadata_bonus(chunk.text, doc_title=chunk.meta.title)
        gp = scoring.gibberish_penalty(chunk.text, threshold=0.20)
        if gp < 1.0:
            scores[i] *= gp
        fz = scoring.fuzzy_match_bonus(chunk.text, q, min_length=20)
        if fz > 0:
            scores[i] += 2.0 * fz
    order = sorted(range(len(scores)), key=lambda i: scores[i], reverse=True)
    pool = order[:cfg["bm25"]["pool_size"]]

    rm3_expanded = None
    if prf_enabled:
        rm3_expanded = prf.rm3_expand_query(q, bm25, tokenized, chunks,
                                            fb_docs=prf_cfg["fb_docs"],
                                            fb_terms=prf_cfg["fb_terms"],
                                            alpha=prf_cfg["alpha"])

    pipeline_goldens.append({
        "query": q,
        "prf_enabled": prf_enabled,
        "q_tokens": q_tokens,
        "base_scores_nonzero": {str(i): float(base_scores[i])
                                for i in range(len(chunks)) if base_scores[i] != 0.0},
        "bonused_scores": [float(s) for s in scores],
        "pool": pool,
        "rm3_expanded": rm3_expanded,
        "confidence": confidence,
        "results": results,
    })
dump("pipeline.json", pipeline_goldens)

# RRF unit vectors
rrf_cases = [
    {"runs": [[1, 2, 3], [3, 2, 1]], "C": 60, "cap": 200},
    {"runs": [[5, 1, 9, 4], [9, 5], [1, 9, 5]], "C": 75, "cap": 2},
    {"runs": [[0]], "C": 75, "cap": 200},
]
for case in rrf_cases:
    case["fused"] = fusion.rrf_fuse(case["runs"], C=case["C"], cap=case["cap"])
dump("rrf.json", rrf_cases)

print("all goldens written to", OUT)

# ---------------------------------------------------------------------------
# 4. Misc direct-function vectors (operators not exercised by the pipeline
#    defaults: MMR with >k candidates, apply_diversity_selection, citations,
#    rerank internals, DOI regex)
# ---------------------------------------------------------------------------
from lightweight_rag import models as ref_models, rerank as ref_rerank, cite as ref_cite
from lightweight_rag.diversity import mmr_selection, apply_diversity_selection

misc = {}

misc["find_doi"] = [
    {"text": t, "doi": ref_models.find_doi_in_text(t)}
    for t in ["no doi here", "see 10.1234/abcd.efg123], trailing",
              "DOI: 10.5555/J.PROC-2020.77;", "10.12/short", "prefix 10.99999/x(y):z.,"]
]

misc["window"] = [
    {"text": t, "maxlen": m, "out": ref_models.window(t, m)}
    for t in ["  padded  text\nwith lines  ", "x" * 950, "short"]
    for m in [10, 100, 900]
]

rng3 = random.Random(99)
mmr_cases = []
for n, k in [(12, 5), (25, 8), (6, 6), (3, 8)]:
    cands = []
    for i in range(n):
        words = [rng3.choice(WORDS) for _ in range(rng3.randint(5, 30))]
        cands.append([i * 7, " ".join(words), rng3.uniform(0, 10)])
    q = " ".join(rng3.choice(WORDS) for _ in range(4))
    sel = mmr_selection(q, [tuple(c) for c in cands], 0.7, k)
    mmr_cases.append({"query": q, "candidates": cands, "k": k, "selected": sel})
misc["mmr"] = mmr_cases

adv_cases = []
for trial in range(4):
    n = rng3.randint(5, 30)
    results = [[rng3.randrange(len(chunks)), rng3.uniform(0, 10)] for _ in range(n)]
    results.sort(key=lambda x: -x[1])
    out = apply_diversity_selection([tuple(r) for r in results], chunks, 0.3, 2)
    adv_cases.append({"results": results,
                      "out": [[i, s] for i, s in out]})
misc["apply_diversity"] = adv_cases

cite_cases = []
for meta_kw, page in [
    (dict(title="T", authors=[], year=None, doi=None, source="s"), 3),
    (dict(title="T", authors=["Smith, John"], year=2020, doi=None, source="s"), 1),
    (dict(title=None, authors=["Garcia, A.", "Wu, B."], year=2019, doi=None,
          source="s", start_page=300, citekey="garcia2019x"), 5),
    (dict(title=None, authors=["Lee, C."], year=None, doi=None, source="s",
          citekey="lee"), 2),
]:
    m = DocMeta(**meta_kw)
    cite_cases.append({
        "meta": meta_kw, "page": page,
        "author_date": ref_cite.author_date_citation(m, page),
        "pandoc": ref_cite.pandoc_citation(m, page)})
misc["citations"] = cite_cases

rr_cases = []
for trial in range(6):
    q = " ".join(rng3.choice(WORDS) for _ in range(rng3.randint(2, 6)))
    doc = " ".join(rng3.choice(WORDS) for _ in range(rng3.randint(10, 120)))
    qt = ref_rerank.tokenize_for_rerank(q)
    dt = ref_rerank.tokenize_for_rerank(doc)
    idf = ref_rerank.idf_weight(qt, {}, 100000)
    rr_cases.append({
        "query": q, "doc": doc,
        "idf": idf,
        "coverage": ref_rerank.coverage_score(qt, dt, idf),
        "proximity": ref_rerank.proximity_score(qt, dt, window=24),
        "phrase": ref_rerank.phrase_boost(q, doc)})
misc["rerank_internals"] = rr_cases

# simple_tfidf_vectors / cosine_similarity_sparse (diversity.py:24-100) —
# dead code in the reference (never called) but part of the §2.10 surface;
# fresh RNG so the existing goldens' draw sequence is untouched
from lightweight_rag.diversity import simple_tfidf_vectors, cosine_similarity_sparse
rng4 = random.Random(777)
tfidf_cases = []
for n in (3, 6, 10):
    texts = [" ".join(rng4.choice(WORDS) for _ in range(rng4.randint(4, 25)))
             for _ in range(n)]
    q = " ".join(rng4.choice(WORDS) for _ in range(3))
    vecs, qvec = simple_tfidf_vectors(texts, q)
    sims = [cosine_similarity_sparse(v, qvec) for v in vecs]
    pair_sims = [cosine_similarity_sparse(vecs[i], vecs[j])
                 for i in range(len(vecs)) for j in range(i + 1, len(vecs))]
    tfidf_cases.append({
        "texts": texts, "query": q,
        "vectors": [{k: v for k, v in sorted(vec.items())} for vec in vecs],
        "query_vector": {k: v for k, v in sorted(qvec.items())},
        "query_sims": sims, "pair_sims": pair_sims})
misc["tfidf_fallback"] = tfidf_cases

dump("misc_vectors.json", misc)

# citekey fallback assignment goldens (io_pdf.py:558-606)
from lightweight_rag.io_pdf import _ensure_citekeys_for_corpus, _generate_fallback_citekey

ck_corpus = []
files = ["Alpha_paper 2020.pdf", "alpha-other.pdf", "Alpha_second.pdf",
         "beta,report.pdf", "verylongfilenamethatexceeds.pdf", "gamma.pdf",
         "alpha_third.pdf"]
for d, fn in enumerate(files):
    for p in range(1, 3):
        meta = DocMeta(title=None, authors=[], year=None, doi=None,
                       source=fn, citekey=("preset" if d == 5 else None))
        ck_corpus.append(Chunk(doc_id=d, source=fn, page=p, text=f"t{d}p{p}", meta=meta))
_ensure_citekeys_for_corpus(ck_corpus)
misc2 = {
    "fallback_keys": [{"filename": f, "key": _generate_fallback_citekey(f)} for f in files],
    "assigned": [{"source": c.source, "page": c.page, "citekey": c.meta.citekey}
                 for c in ck_corpus],
}
dump("citekeys.json", misc2)
