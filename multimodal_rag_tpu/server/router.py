"""Multi-slice front-end router: scale-out across serving slices over DCN.

The reference is strictly single-process (SURVEY.md §2.4); its TPU mapping
(§5.8) calls for one serving slice per mesh with "multi-slice scale-out
over DCN with a front-end router". This is that router: a thin stateless-
compute aiohttp process in front of N backend slices (each a full
``server.api`` app with its own corpus shard), implementing:

* **Document affinity** — ``POST /upload`` round-robins across healthy
  slices; the resulting doc_id → slice assignment persists to a JSON map
  so deletes and re-uploads route to the owning slice.
* **Scatter-gather query** — ``POST /query`` fans out to every healthy
  slice in parallel, merges the per-slice sources by relevance (the same
  k·slices → top-k merge the on-chip collectives path uses, one level up),
  and keeps the answer from the slice with the best-scoring evidence.
* **Aggregation** — ``/documents``, ``/stats``, ``/health`` fan in;
  ``DELETE /documents`` broadcasts.
* **Failure detection** — a slice failing a request or health probe is
  skipped (marked down) and retried on the next health sweep; the router
  serves from the surviving slices (the elastic posture SURVEY §5.3 notes
  the reference delegates to systemd).

Run: ``python -m multimodal_rag_tpu.server.router --backends
http://h1:8000,http://h2:8000 [--port 9000]``.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import os
import time
from typing import Dict, List, Optional

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)

HEALTH_SWEEP_S = 15.0
def _max_upload_bytes() -> int:
    """Same cap as the backend app (server/api.py: MAX_UPLOAD_SIZE + 1 MB
    slack), derived from the shared settings so raising MAX_UPLOAD_SIZE in
    .env raises both ends together. The router buffers the body to retry
    it on another slice, so accepting more than any backend can take would
    (a) waste router RSS and (b) forward a doomed request to every slice."""
    from multimodal_rag_tpu.config import settings

    return settings.max_upload_bytes + (1 << 20)


def _default_top_k() -> int:
    """Same default the backend's QueryRequest applies (TOP_K_RESULTS,
    clamped to the route's 1..20 bounds) so a routed query without top_k
    truncates the merged results exactly like a direct one."""
    from multimodal_rag_tpu.config import settings

    return min(max(settings.TOP_K_RESULTS, 1), 20)


class SlicePool:
    """Backend slice registry with health state and doc affinity."""

    def __init__(self, backends: List[str], state_path: Optional[str] = None):
        self.backends = [b.rstrip("/") for b in backends]
        self.healthy = {b: True for b in self.backends}
        self.state_path = state_path
        self.doc_owner: Dict[str, str] = {}
        self._rr = 0
        if state_path and os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    self.doc_owner = json.load(f)
            except Exception:  # noqa: BLE001
                self.doc_owner = {}

    def save(self) -> None:
        if self.state_path:
            with open(self.state_path, "w") as f:
                json.dump(self.doc_owner, f)

    def up(self) -> List[str]:
        live = [b for b in self.backends if self.healthy.get(b)]
        return live or self.backends  # all down: try anyway

    def pick_for_upload(self) -> str:
        live = self.up()
        self._rr = (self._rr + 1) % len(live)
        return live[self._rr]

    def owner_of(self, doc_id: str) -> Optional[str]:
        return self.doc_owner.get(doc_id)

    def mark(self, backend: str, ok: bool) -> None:
        if self.healthy.get(backend) != ok:
            logger.warning("slice %s -> %s", backend, "up" if ok else "DOWN")
        self.healthy[backend] = ok


def create_router_app(
    backends: List[str], state_path: Optional[str] = None
) -> web.Application:
    pool = SlicePool(backends, state_path)
    app = web.Application(client_max_size=_max_upload_bytes())
    app["pool"] = pool

    def session() -> aiohttp.ClientSession:
        return app["session"]

    async def on_startup(app):
        app["session"] = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=600)
        )
        app["sweep"] = asyncio.get_event_loop().create_task(sweep())

    async def on_cleanup(app):
        app["sweep"].cancel()
        await app["session"].close()
        pool.save()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)

    async def sweep():
        while True:
            for b in pool.backends:
                try:
                    async with session().get(
                        f"{b}/health",
                        timeout=aiohttp.ClientTimeout(total=10),
                    ) as r:
                        pool.mark(b, r.status == 200)
                except Exception:  # noqa: BLE001
                    pool.mark(b, False)
            await asyncio.sleep(HEALTH_SWEEP_S)

    async def scatter(method: str, path: str, **kwargs):
        """Fan a request out to every healthy slice → [(backend, json)]."""
        async def one(b):
            try:
                async with session().request(
                    method, f"{b}{path}", **kwargs
                ) as r:
                    if r.status != 200:
                        return b, None
                    return b, await r.json()
            except Exception:  # noqa: BLE001
                pool.mark(b, False)
                return b, None

        results = await asyncio.gather(*(one(b) for b in pool.up()))
        return [(b, data) for b, data in results if data is not None]

    # --- routes -----------------------------------------------------------

    async def upload(request):
        raw = await request.read()
        headers = {
            k: v for k, v in request.headers.items()
            if k.lower() in ("content-type", "content-length")
        }
        last_error = None
        for _attempt in range(len(pool.up())):
            backend = pool.pick_for_upload()
            try:
                async with session().post(
                    f"{backend}/upload", data=raw, headers=headers
                ) as r:
                    # Parse the body AFTER branching on status: backend
                    # 4xx/413 responses may be text/plain, and a parse
                    # error must not be mistaken for a dead slice.
                    if r.status == 200:
                        try:
                            body = await r.json()
                            doc_id = body["doc_id"]
                        except Exception:  # noqa: BLE001 — mangled body
                            # The slice DID ingest (200) — retrying would
                            # duplicate the document, and the slice is
                            # alive, so don't mark it down either.
                            return web.json_response(
                                {"detail": "slice returned an unreadable "
                                           "200 upload response"},
                                status=502,
                            )
                        pool.doc_owner[doc_id] = backend
                        pool.save()
                        return web.json_response(body)
                    try:
                        body = await r.json()
                    except Exception:  # noqa: BLE001 — non-JSON error page
                        body = {"detail": (await r.text())[:500]}
                    # ANY HTTP response is propagated, 5xx included: a
                    # responding slice may have PARTIALLY ingested before
                    # erroring (vectors/KV rows written), and replaying
                    # the upload elsewhere would duplicate the document
                    # across slices with affinity pointing at only one.
                    return web.json_response(body, status=r.status)
            except Exception as e:  # noqa: BLE001 — connection-level only
                pool.mark(backend, False)
                last_error = e
        return web.json_response(
            {"detail": f"no slice accepted the upload: {last_error}"},
            status=503,
        )

    async def query(request):
        start = time.time()
        try:
            body = await request.json()
        except ValueError:
            return web.json_response({"detail": "JSON required"}, status=422)
        if not isinstance(body, dict):
            return web.json_response(
                {"detail": "JSON object required"}, status=422
            )
        hits = await scatter("POST", "/query", json=body)
        if not hits:
            return web.json_response(
                {"detail": "no healthy slices"}, status=503
            )
        top_k = body.get("top_k") or _default_top_k()
        # Merge evidence: best-relevance-first across slices, then re-rank.
        merged = []
        best = None
        for backend, data in hits:
            sources = data.get("sources", [])
            merged.extend(sources)
            score = max(
                (s.get("relevance_score", 0.0) for s in sources), default=0.0
            )
            if best is None or score > best[0]:
                best = (score, data)
        merged.sort(key=lambda s: -s.get("relevance_score", 0.0))
        merged = merged[:top_k]
        for rank, s in enumerate(merged, 1):
            s["rank"] = rank
        return web.json_response(
            {
                "answer": best[1].get("answer", ""),
                "sources": merged,
                "processing_time": time.time() - start,
            }
        )

    async def documents(request):
        hits = await scatter("GET", "/documents")
        docs = []
        for _b, data in hits:
            docs.extend(data.get("documents", []))
        docs.sort(key=lambda d: d.get("timestamp", ""), reverse=True)
        return web.json_response({"total": len(docs), "documents": docs})

    async def delete_document(request):
        doc_id = request.match_info["doc_id"]
        owner = pool.owner_of(doc_id)
        targets = [owner] if owner else pool.up()
        if not targets:
            # No owner recorded and nothing healthy to consult: a 404 here
            # would mask a total outage as "not found" (mirrors the
            # upload/query posture).
            return web.json_response(
                {"detail": "no healthy slices"}, status=503
            )
        deleted = False
        failed = False  # connection error OR a non-200/404 response
        for b in targets:
            try:
                async with session().delete(f"{b}/documents/{doc_id}") as r:
                    if r.status == 200:
                        deleted = True
                    elif r.status != 404:
                        # The slice answered but did NOT delete (e.g. 503
                        # mid-restart): the document still exists there —
                        # same treatment as unreachable, or the affinity
                        # drop below would orphan it.
                        failed = True
            except Exception:  # noqa: BLE001
                pool.mark(b, False)
                failed = True
        if deleted or not failed:
            # Confirmed gone (or confirmed 404 on every reachable
            # target). A failed owner keeps its affinity so the delete
            # can be retried once the slice recovers — dropping it here
            # would orphan the document.
            pool.doc_owner.pop(doc_id, None)
            pool.save()
        if deleted:
            return web.json_response(
                {"message": f"Document {doc_id} deleted"}
            )
        if failed:
            return web.json_response(
                {"detail": "owning slice unavailable; retry later"},
                status=503,
            )
        return web.json_response({"detail": "not found"}, status=404)

    async def delete_all(request):
        hits = await scatter("DELETE", "/documents")
        count = sum(d.get("count", 0) for _b, d in hits)
        # Only forget affinity for documents whose slice actually
        # confirmed the delete; docs on skipped (down) slices keep their
        # mapping and survive until a retry reaches their owner.
        reached = {b for b, _ in hits}
        skipped = [b for b in pool.backends if b not in reached]
        for doc_id, owner in list(pool.doc_owner.items()):
            if owner in reached or owner not in pool.backends:
                pool.doc_owner.pop(doc_id, None)
        pool.save()
        resp = {"message": f"Deleted {count} documents", "count": count}
        if skipped:
            resp["slices_skipped"] = skipped
            resp["message"] += (
                f" ({len(skipped)} slice(s) unreachable — their documents "
                "were NOT deleted)"
            )
        return web.json_response(resp)

    async def health(request):
        hits = await scatter("GET", "/health")
        statuses = {b: d.get("status") for b, d in hits}
        up = sum(1 for s in statuses.values() if s in ("healthy", "degraded"))
        status = (
            "healthy" if up == len(pool.backends)
            else "degraded" if up else "unhealthy"
        )
        return web.json_response(
            {
                "status": status,
                "slices": {
                    b: statuses.get(b, "down") for b in pool.backends
                },
                "router": True,
            },
            status=200 if up else 503,
        )

    async def stats(request):
        hits = await scatter("GET", "/stats")
        total_docs = sum(
            d.get("documents", {}).get("total", 0) for _b, d in hits
        )
        total_chunks = sum(
            d.get("documents", {}).get("total_chunks", 0) for _b, d in hits
        )
        return web.json_response(
            {
                "documents": {"total": total_docs,
                              "total_chunks": total_chunks},
                "slices": {b: d for b, d in hits},
                "router": True,
            }
        )

    async def search_images(request):
        try:
            body = await request.json()
        except ValueError:
            return web.json_response({"detail": "JSON required"}, status=422)
        if not isinstance(body, dict):
            return web.json_response(
                {"detail": "JSON object required"}, status=422
            )
        hits = await scatter("POST", "/search/images", json=body)
        if not hits:
            return web.json_response(
                {"detail": "no healthy slices"}, status=503
            )
        results = []
        for _b, data in hits:
            results.extend(data.get("results", []))
        results.sort(key=lambda h: -h.get("relevance", 0.0))
        return web.json_response(
            {"results": results[: body.get("top_k") or _default_top_k()]}
        )

    async def v1_proxy(request):
        """OpenAI-surface passthrough (/v1/chat/completions, /v1/embeddings,
        /v1/models): generation and embedding are stateless across slices,
        so any healthy slice serves the call — try them in order, failing
        over on connection errors / 5xx, propagating 4xx as-is. SSE
        responses (stream: true) are piped through chunk by chunk."""
        raw = await request.read()
        headers = {
            k: v for k, v in request.headers.items()
            if k.lower() in ("content-type", "accept")
        }
        last_error = None
        streaming_resp = None  # set once a response is committed
        for b in pool.up():
            try:
                async with session().request(
                    request.method, f"{b}{request.path}", data=raw,
                    headers=headers,
                    timeout=aiohttp.ClientTimeout(total=600),
                ) as r:
                    ctype = r.headers.get("Content-Type", "application/json")
                    if "text/event-stream" in ctype:
                        resp = web.StreamResponse(
                            status=r.status,
                            headers={
                                "Content-Type": ctype,
                                "Cache-Control": "no-cache",
                            },
                        )
                        await resp.prepare(request)
                        # From here the response is committed: a client
                        # disconnect or a backend dying mid-stream must
                        # END the stream, not mark the slice down and
                        # replay the whole generation on another slice
                        # (duplicate TPU work + a second prepare() on an
                        # already-prepared request).
                        streaming_resp = resp
                        async for chunk in r.content.iter_any():
                            await resp.write(chunk)
                        await resp.write_eof()
                        return resp
                    body = await r.read()
                    if r.status == 200 or 400 <= r.status < 500:
                        # Success or the client's own fault — same answer
                        # on every slice, so don't fail over.
                        return web.Response(
                            body=body, status=r.status,
                            content_type=ctype.split(";")[0].strip(),
                        )
                    last_error = f"slice {b} returned {r.status}"
            except Exception as e:  # noqa: BLE001
                if streaming_resp is not None:
                    # Mid-stream failure after commit: best-effort close.
                    # The backend is not necessarily dead (the CLIENT may
                    # have disconnected), so don't mark it down.
                    logger.info("/v1 stream ended early: %s", e)
                    try:
                        await streaming_resp.write_eof()
                    except Exception:  # noqa: BLE001
                        pass
                    return streaming_resp
                # Connection-level failure before any bytes were sent:
                # safe to fail over.
                pool.mark(b, False)
                last_error = e
        return web.json_response(
            {"error": {"message": f"no slice available: {last_error}",
                       "type": "server_error"}},
            status=503,
        )

    app.router.add_post("/upload", upload)
    app.router.add_post("/query", query)
    app.router.add_get("/documents", documents)
    app.router.add_delete("/documents/{doc_id}", delete_document)
    app.router.add_delete("/document/{doc_id}", delete_document)
    app.router.add_delete("/documents", delete_all)
    app.router.add_get("/health", health)
    app.router.add_get("/stats", stats)
    app.router.add_post("/search/images", search_images)
    app.router.add_route("*", "/v1/{tail:.+}", v1_proxy)
    return app


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="multi-slice front-end router")
    ap.add_argument(
        "--backends", required=True,
        help="comma-separated backend base URLs",
    )
    ap.add_argument("--port", type=int, default=9000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument(
        "--state", default="./router_state.json",
        help="doc_id -> slice affinity map path",
    )
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    app = create_router_app(args.backends.split(","), args.state)
    web.run_app(app, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
