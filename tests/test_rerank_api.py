"""HTTP contract tests for POST /v1/rerank (Cohere/Jina-style rerank
service over the on-TPU reranker). The reranker math itself is covered by
test_rerank.py / test_late_interaction.py; these tests pin the HTTP
surface: validation, index mapping, top_n, return_documents, and the
explicit 503 when only a pass-through (untrained) reranker is available."""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from multimodal_rag_tpu.server.api import create_app

from test_api import make_components


class ScoreByLength:
    """Deterministic fake with the CrossEncoderReranker.rerank contract:
    score = document length, ranked descending."""

    def rerank(self, query, results, top_k=None):
        docs = results["documents"]
        scores = np.array([float(len(d)) for d in docs])
        order = np.argsort(-scores, kind="stable")
        if top_k is not None:
            order = order[:top_k]
        out = {
            key: [results[key][i] for i in order]
            for key in ("ids", "distances", "metadatas", "documents")
            if key in results
        }
        out["rerank_scores"] = [float(scores[i]) for i in order]
        return out


class PassThrough:
    """Untrained-reranker semantics: results returned unchanged, no
    rerank_scores key (cross_encoder.py rerank() when not trained)."""

    def rerank(self, query, results, top_k=None):
        return results


@pytest.fixture()
def client(tmp_path):
    loop = asyncio.new_event_loop()
    comps = make_components(tmp_path)
    loop.run_until_complete(comps.initialize())
    comps.embedder._reranker = ScoreByLength()
    app = create_app(components=comps)
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop, comps
    loop.run_until_complete(client.close())
    loop.close()


def post(client, loop, body):
    async def do():
        resp = await client.post("/v1/rerank", json=body)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


DOCS = ["short", "a medium-length passage", "the longest passage of all three"]


def test_rerank_orders_and_maps_indices(client):
    c, loop, _ = client
    status, body = post(c, loop, {"query": "q", "documents": DOCS})
    assert status == 200
    # ScoreByLength ranks longest-first; index refers to the REQUEST order.
    assert [r["index"] for r in body["results"]] == [2, 1, 0]
    assert [r["document"]["text"] for r in body["results"]] == [
        DOCS[2], DOCS[1], DOCS[0],
    ]
    scores = [r["relevance_score"] for r in body["results"]]
    assert scores == sorted(scores, reverse=True)
    assert body["usage"]["total_tokens"] > 0


def test_rerank_accepts_text_objects_and_top_n(client):
    c, loop, _ = client
    status, body = post(c, loop, {
        "query": "q",
        "documents": [{"text": d} for d in DOCS],
        "top_n": 2,
    })
    assert status == 200
    assert [r["index"] for r in body["results"]] == [2, 1]


def test_rerank_return_documents_false(client):
    c, loop, _ = client
    status, body = post(c, loop, {
        "query": "q", "documents": DOCS, "return_documents": False,
    })
    assert status == 200
    assert all("document" not in r for r in body["results"])


def test_rerank_validation_errors(client):
    c, loop, _ = client
    for bad in (
        {"documents": DOCS},                              # missing query
        {"query": "  ", "documents": DOCS},               # blank query
        {"query": "q"},                                   # missing documents
        {"query": "q", "documents": []},                  # empty documents
        {"query": "q", "documents": [1]},                 # non-text item
        {"query": "q", "documents": [{"body": "x"}]},     # wrong object key
        {"query": "q", "documents": DOCS, "top_n": 0},    # bad top_n
        {"query": "q", "documents": DOCS, "top_n": True},  # bool top_n
        {"query": "q", "documents": DOCS,
         "return_documents": "yes"},                      # non-bool flag
        {"query": "q", "documents": ["x" * 10_001]},      # oversized doc
    ):
        status, body = post(c, loop, bad)
        assert status == 400, bad
        assert body["error"]["type"] == "invalid_request_error"


def test_rerank_untrained_is_503_not_silent_echo(client):
    c, loop, comps = client
    comps.embedder._reranker = PassThrough()
    status, body = post(c, loop, {"query": "q", "documents": DOCS})
    assert status == 503
    assert "no trained reranker" in body["error"]["message"]


def test_rerank_listed_in_docs(client):
    c, loop, _ = client

    async def do():
        resp = await c.get("/openapi.json")
        return await resp.json()

    spec = loop.run_until_complete(do())
    assert "post" in spec["paths"]["/v1/rerank"]
