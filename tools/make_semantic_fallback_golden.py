#!/usr/bin/env python3
"""Golden for the semantic run-D fallback semantics, produced by RUNNING the
reference implementation (rerank.py:254-309 semantic_rerank + the
fusion.py:188-199 run-D ordering) with a deterministic stand-in encoder.

Three scenarios:
  unavailable  - SentenceTransformer is None -> raw scores returned wholesale
  partial_fail - one chunk's encode raises -> _chunk_embeddings None -> raw
                 scores returned wholesale (the branch VERDICT r4 #4 flags)
  all_embedded - every encode succeeds -> 0.7*minmax(bm25) + 0.3*cos combined
                 (positive control pinning the float chain)

The stand-in encoder emits +-0.5 components (dim 4) from the text's md5, so
every vector is EXACTLY unit-norm and every dot product is an exact binary
fraction -- the combined scores are bit-identical across Python and Scala
regardless of summation order.
"""
import hashlib
import json
import sys
import types

import numpy as np

MARKER = "FAIL_EMBED"


def sign_vec(text):
    h = hashlib.md5(text.encode("utf-8")).digest()
    return np.array([0.5 if (h[j] & 1) else -0.5 for j in range(4)])


st_mod = types.ModuleType("sentence_transformers")


class SentenceTransformer:  # deterministic stand-in, see module docstring
    def __init__(self, name, **kw):
        pass

    def encode(self, texts, convert_to_numpy=True):
        out = []
        for t in texts if isinstance(texts, list) else [texts]:
            if MARKER in t:
                raise RuntimeError("encode failure injected for golden")
            out.append(sign_vec(t))
        return np.vstack(out)


st_mod.SentenceTransformer = SentenceTransformer
sys.modules["sentence_transformers"] = st_mod
sys.path.insert(0, "/root/reference")

# minimal dependency stubs so the reference package imports (same approach
# as make_goldens.py; rank_bm25 itself is unused by these scenarios)
rank_bm25_mod = types.ModuleType("rank_bm25")
rank_bm25_mod.BM25Okapi = object
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

from lightweight_rag import rerank  # noqa: E402

QUERY = "distributed query engines"
SCORES = [5.0, 3.5, 2.0, 1.25, 0.5]


def run_d_order(indices, score_map, baseline):
    # fusion.py:195-199 -- stable sort by new score, descending
    return sorted(indices, key=lambda i: score_map.get(i, baseline[i]), reverse=True)


def scenario(name, texts, scores):
    out = rerank.semantic_rerank(QUERY, list(texts), list(scores))
    idx = list(range(len(texts)))
    order = run_d_order(idx, {i: out[i] for i in idx}, scores)
    return {"name": name, "query": QUERY, "texts": texts, "scores": scores,
            "out_scores": out, "run_d_order": order}


cases = []

# the reference lazy-imports sentence_transformers inside _load_model;
# priming it is the "library available" state the all_embedded and
# partial_fail scenarios model
rerank._load_model("sentence-transformers/all-MiniLM-L6-v2")

texts_ok = [
    "partitioned inverted index build",
    "block max wand pruning",
    "posting list compression codec",
    "shuffle grain for the exchange",
    "bm25 idf flooring epsilon",
]
cases.append(scenario("all_embedded", texts_ok, SCORES))

texts_fail = list(texts_ok)
texts_fail[2] = "this chunk cannot embed " + MARKER
cases.append(scenario("partial_fail", texts_fail, SCORES))

saved = rerank.SentenceTransformer
rerank.SentenceTransformer = None
cases.append(scenario("unavailable", texts_ok, SCORES))
rerank.SentenceTransformer = saved

# sanity: both fallback scenarios must return the raw scores object semantics
assert cases[1]["out_scores"] == SCORES
assert cases[2]["out_scores"] == SCORES
assert cases[0]["out_scores"] != SCORES

out_path = "src/test/resources/goldens/semantic_fallback.json"
with open(out_path, "w") as f:
    json.dump({"marker": MARKER, "cases": cases}, f, indent=1)
print("wrote", out_path)
for c in cases:
    print(c["name"], c["out_scores"], c["run_d_order"])
