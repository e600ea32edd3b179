"""Multi-slice router: scatter-gather query, doc affinity, failover."""

import asyncio
import io

import aiohttp
import pytest
from aiohttp.test_utils import TestClient, TestServer

from multimodal_rag_tpu.server.api import create_app
from multimodal_rag_tpu.server.router import create_router_app
from tests.test_api import make_components


@pytest.fixture()
def cluster(tmp_path):
    """Two backend slices + a router in front, all in-process."""
    loop = asyncio.new_event_loop()
    backends = []
    servers = []
    for i in range(2):
        comps = make_components(tmp_path / f"slice{i}")
        loop.run_until_complete(comps.initialize())
        server = TestServer(create_app(components=comps), loop=loop)
        loop.run_until_complete(server.start_server())
        servers.append(server)
        backends.append(f"http://{server.host}:{server.port}")

    router_app = create_router_app(
        backends, state_path=str(tmp_path / "affinity.json")
    )
    client = TestClient(TestServer(router_app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop, servers
    loop.run_until_complete(client.close())
    for s in servers:
        loop.run_until_complete(s.close())
    loop.close()


def upload(client, loop, name, content):
    form = aiohttp.FormData()
    form.add_field("file", io.BytesIO(content), filename=name,
                   content_type="text/plain")

    async def do():
        resp = await client.post("/upload", data=form)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


def post_json(client, loop, path, body):
    async def do():
        resp = await client.post(path, json=body)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


def get_json(client, loop, path):
    async def do():
        resp = await client.get(path)
        return resp.status, await resp.json()

    return loop.run_until_complete(do())


class TestRouter:
    def test_uploads_round_robin_and_affinity(self, cluster):
        client, loop, _ = cluster
        ids = []
        for i in range(4):
            status, body = upload(
                client, loop, f"d{i}.txt",
                f"Document number {i} about machine learning topic.".encode(),
            )
            assert status == 200
            ids.append(body["doc_id"])
        pool = client.server.app["pool"]
        owners = {pool.owner_of(d) for d in ids}
        assert len(owners) == 2  # spread across both slices

        status, body = get_json(client, loop, "/documents")
        assert status == 200 and body["total"] == 4

    def test_scatter_gather_query_merges_sources(self, cluster):
        client, loop, _ = cluster
        upload(client, loop, "a.txt", b"TPU kernels stream vectors from HBM.")
        upload(client, loop, "b.txt", b"Gzip compresses raw document chunks.")
        status, body = post_json(
            client, loop, "/query",
            {"query": "vector kernels on TPU", "top_k": 4},
        )
        assert status == 200
        assert body["answer"]
        ranks = [s["rank"] for s in body["sources"]]
        assert ranks == sorted(ranks)
        rels = [s["relevance_score"] for s in body["sources"]]
        assert rels == sorted(rels, reverse=True)
        # evidence from both slices is eligible
        doc_ids = {s["doc_id"].rsplit("_", 2)[0] for s in body["sources"]}
        assert len(doc_ids) >= 2

    def test_delete_routes_to_owner(self, cluster):
        client, loop, _ = cluster
        _, body = upload(client, loop, "x.txt", b"To be deleted soon.")
        doc_id = body["doc_id"]

        async def do():
            resp = await client.delete(f"/documents/{doc_id}")
            return resp.status

        assert loop.run_until_complete(do()) == 200
        _, docs = get_json(client, loop, "/documents")
        assert all(d["doc_id"] != doc_id for d in docs["documents"])

    def test_health_aggregates(self, cluster):
        client, loop, _ = cluster
        status, body = get_json(client, loop, "/health")
        assert status == 200
        assert body["router"] is True
        assert len(body["slices"]) == 2

    def test_failover_on_dead_slice(self, cluster):
        client, loop, servers = cluster
        upload(client, loop, "pre.txt", b"Survivor document content here.")
        # Kill slice 0; the router should keep serving from slice 1.
        loop.run_until_complete(servers[0].close())
        for i in range(3):
            status, _ = upload(
                client, loop, f"post{i}.txt",
                f"After failure doc {i} content.".encode(),
            )
            assert status == 200
        status, body = post_json(
            client, loop, "/query", {"query": "content", "top_k": 3}
        )
        assert status == 200 and body["sources"]

    def test_client_error_propagates_without_failover(self, cluster):
        """A 4xx from a slice is the client's fault: the router must
        return it as-is, not mark the healthy slice down and retry the
        doomed request on every other slice."""
        client, loop, _ = cluster
        # Empty file → backend 400/422-class rejection.
        status, _body = upload(client, loop, "empty.txt", b"")
        assert 400 <= status < 500
        pool = client.server.app["pool"]
        assert all(pool.healthy.values()), pool.healthy

    def test_non_object_json_is_422(self, cluster):
        client, loop, _ = cluster

        async def do(payload):
            resp = await client.post("/query", json=payload)
            return resp.status

        assert loop.run_until_complete(do([1, 2])) == 422
        assert loop.run_until_complete(do("hello")) == 422

    def test_delete_keeps_affinity_when_owner_down(self, cluster):
        """Deleting a doc whose owning slice is unreachable must return
        503 and RETAIN the affinity mapping (dropping it would orphan
        the document until manual cleanup)."""
        client, loop, servers = cluster
        _, body = upload(client, loop, "keep.txt", b"Owned document text.")
        doc_id = body["doc_id"]
        pool = client.server.app["pool"]
        owner = pool.owner_of(doc_id)
        # Kill exactly the owning slice.
        idx = 0 if owner.endswith(str(servers[0].port)) else 1
        loop.run_until_complete(servers[idx].close())

        async def do():
            resp = await client.delete(f"/documents/{doc_id}")
            return resp.status

        assert loop.run_until_complete(do()) == 503
        assert pool.owner_of(doc_id) == owner  # affinity survives

    def test_delete_with_no_slices_is_503(self, tmp_path):
        """No recorded owner AND no slice to consult (empty pool): the
        router never asked anyone, so 'not found' would mask a total
        outage — it must report 503 like the upload/query paths
        (ADVICE r2)."""
        loop = asyncio.new_event_loop()
        try:
            app = create_router_app(
                [], state_path=str(tmp_path / "aff.json")
            )
            client = TestClient(TestServer(app, loop=loop), loop=loop)
            loop.run_until_complete(client.start_server())

            async def do():
                resp = await client.delete("/documents/doc_neverseen123")
                return resp.status

            assert loop.run_until_complete(do()) == 503
            loop.run_until_complete(client.close())
        finally:
            loop.close()

    def test_delete_all_skips_down_slice_honestly(self, cluster):
        """delete_all with a dead slice must keep that slice's affinity
        entries and report the skip instead of claiming a full wipe."""
        client, loop, servers = cluster
        upload(client, loop, "a.txt", b"Doc on some slice one.")
        upload(client, loop, "b.txt", b"Doc on the other slice.")
        pool = client.server.app["pool"]
        dead = f"http://{servers[0].host}:{servers[0].port}"
        loop.run_until_complete(servers[0].close())
        pool.mark(dead, False)
        n_dead_docs = sum(
            1 for o in pool.doc_owner.values() if o == dead
        )

        async def do():
            resp = await client.delete("/documents")
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(do())
        assert status == 200
        assert body.get("slices_skipped") == [dead]
        remaining = [o for o in pool.doc_owner.values()]
        assert len(remaining) == n_dead_docs
        assert all(o == dead for o in remaining)

    def test_delete_all_broadcasts(self, cluster):
        client, loop, _ = cluster
        upload(client, loop, "m.txt", b"One doc on some slice.")
        upload(client, loop, "n.txt", b"Another doc on the other slice.")

        async def do():
            resp = await client.delete("/documents")
            return resp.status, await resp.json()

        status, body = loop.run_until_complete(do())
        assert status == 200 and body["count"] == 2
        _, docs = get_json(client, loop, "/documents")
        assert docs["total"] == 0

    def test_v1_surface_proxies(self, cluster):
        """OpenAI endpoints pass through to any healthy slice."""
        client, loop, _ = cluster

        async def do():
            r = await client.get("/v1/models")
            models = await r.json()
            e = await client.post(
                "/v1/embeddings", json={"input": "router embed"}
            )
            emb = await e.json()
            c = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 8,
            })
            chat = await c.json()
            return r.status, models, e.status, emb, c.status, chat

        rs, models, es, emb, cs, chat = loop.run_until_complete(do())
        assert rs == 200 and models["object"] == "list"
        assert es == 200 and len(emb["data"]) == 1
        assert cs == 200 and chat["choices"][0]["message"]["content"]

    def test_v1_fails_over_to_healthy_slice(self, cluster):
        """A dead first slice must not take the OpenAI surface down."""
        client, loop, servers = cluster
        pool = client.server.app["pool"]
        dead = f"http://{servers[0].host}:{servers[0].port}"
        loop.run_until_complete(servers[0].close())
        pool.mark(dead, False)

        async def do():
            r = await client.post(
                "/v1/embeddings", json={"input": "failover"}
            )
            return r.status

        assert loop.run_until_complete(do()) == 200

    def test_v1_4xx_propagates(self, cluster):
        client, loop, _ = cluster

        async def do():
            r = await client.post("/v1/embeddings", json={"input": []})
            return r.status, await r.json()

        status, body = loop.run_until_complete(do())
        assert status == 400
        assert body["error"]["type"] == "invalid_request_error"


@pytest.fixture()
def stub_cluster(tmp_path):
    """Router over one stub slice with scriptable status codes — for
    fault-semantics tests a real backend can't conveniently produce."""
    from aiohttp import web as _web

    loop = asyncio.new_event_loop()
    state = {"delete_status": 503, "upload_status": 500}

    async def delete_doc(request):
        return _web.json_response(
            {"detail": "busy"}, status=state["delete_status"]
        )

    async def upload(request):
        await request.read()
        return _web.json_response(
            {"detail": "ingest exploded"}, status=state["upload_status"]
        )

    async def health(request):
        return _web.json_response({"status": "healthy"})

    stub = _web.Application()
    stub.router.add_delete("/documents/{doc_id}", delete_doc)
    stub.router.add_post("/upload", upload)
    stub.router.add_get("/health", health)
    server = TestServer(stub, loop=loop)
    loop.run_until_complete(server.start_server())
    backend = f"http://{server.host}:{server.port}"

    router_app = create_router_app(
        [backend], state_path=str(tmp_path / "affinity.json")
    )
    client = TestClient(TestServer(router_app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop, backend, state
    loop.run_until_complete(client.close())
    loop.run_until_complete(server.close())
    loop.close()


class TestRouterFaultSemantics:
    def test_delete_5xx_keeps_affinity_and_503s(self, stub_cluster):
        """A slice that ANSWERS but fails the delete (503 mid-restart)
        still owns the document: affinity must survive and the client
        must get a retryable 503, not a lying 404."""
        client, loop, backend, _state = stub_cluster
        pool = client.server.app["pool"]
        pool.doc_owner["doc_stuck"] = backend

        async def do():
            resp = await client.delete("/documents/doc_stuck")
            return resp.status

        assert loop.run_until_complete(do()) == 503
        assert pool.owner_of("doc_stuck") == backend

    def test_upload_5xx_propagates_without_retry(self, stub_cluster):
        """A responding slice may have PARTIALLY ingested before its
        5xx — the router must propagate the error, not replay the upload
        elsewhere (duplicate documents), and not mark the slice down."""
        client, loop, backend, _state = stub_cluster
        status, body = upload(client, loop, "x.txt", b"some text")
        assert status == 500
        assert body["detail"] == "ingest exploded"
        pool = client.server.app["pool"]
        assert pool.healthy[backend]
