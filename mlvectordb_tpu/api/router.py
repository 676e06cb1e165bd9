"""Scatter-gather router: cross-NODE sharding/replication at the service level.

The in-process mesh (parallel/) shards a namespace across the chips of ONE JAX runtime
(ICI).  This router is the complementary topology for separate hosts over DCN: N
independent server processes (each a full single- or multi-chip engine) fronted by a
stateless coordinator that
  * routes writes/deletes by uuid hash to the owner backend (same deterministic
    shard_for_id as ShardingManager — reference's README-stub made real at service
    level, SURVEY.md §2.2),
  * broadcasts searches to every backend and merges the top-k lists by score
    (the scatter-gather reduction, but over HTTP instead of ICI),
  * aggregates namespace/info/stats endpoints.

Deliberately stateless: backends own all data; the router can be restarted or
replicated behind a load balancer freely.

Run: python -m mlvectordb_tpu.api.router --port 8000 \
         --backend http://host-a:8001 --backend http://host-b:8001
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import uuid as uuid_mod
from typing import Any, Dict, List, Optional

import aiohttp
from aiohttp import web

from ..config import HIGHER_IS_BETTER, canonical_metric

logger = logging.getLogger("vector_db_router")


def _merge_results(
    result_lists: List[List[Dict[str, Any]]], top_k: int, metric: str
) -> List[Dict[str, Any]]:
    """Fold per-backend result lists into a global top-k (scores are already in the
    user convention: cosine higher-better, l2/ip lower-better)."""
    merged = [r for rs in result_lists for r in rs]
    merged.sort(key=lambda r: r["score"], reverse=HIGHER_IS_BETTER[metric])
    return merged[:top_k]


class RouterAPI:
    def __init__(self, backends: List[str], api_key: Optional[str] = None):
        if not backends:
            raise ValueError("router needs at least one backend URL")
        self.backends = [b.rstrip("/") for b in backends]
        self.api_key = api_key
        self._session: Optional[aiohttp.ClientSession] = None
        self.app = self._build_app()

    # ------------------------------------------------------------------ plumbing

    def _headers(self) -> Dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    async def session(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=300), headers=self._headers()
            )
        return self._session

    def backend_for_id(self, vid: uuid_mod.UUID) -> str:
        return self.backends[vid.int % len(self.backends)]

    async def _post_json(self, url: str, payload, method="POST"):
        try:
            s = await self.session()
            async with s.request(method, url, json=payload) as resp:
                body = await resp.json()
                return resp.status, body
        except (aiohttp.ClientError, asyncio.TimeoutError, OSError) as e:
            # a dead backend degrades the answer, it must not kill the whole request
            logger.warning("backend %s unreachable: %s", url, e)
            return 502, {"detail": f"backend unreachable: {e}"}

    async def _fanout(self, path: str, payload, method="POST"):
        return await asyncio.gather(
            *[self._post_json(b + path, payload, method) for b in self.backends]
        )

    def _build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 1024 * 1024)
        r = app.router
        r.add_post("/vectors", self.insert_vector)
        r.add_put("/vectors/batch", self.upsert_batch)
        r.add_post("/search", self.search)
        r.add_delete("/vectors", self.delete_vectors)
        r.add_get("/namespaces", self.list_namespaces)
        r.add_get("/storage/info", self.storage_info)
        r.add_get("/health", self.health)
        app.on_cleanup.append(self._cleanup)
        return app

    async def _cleanup(self, app):
        if self._session and not self._session.closed:
            await self._session.close()

    # ------------------------------------------------------------------ routes

    async def insert_vector(self, request: web.Request) -> web.Response:
        payload = await request.json()
        # mint the id HERE so routing is deterministic and the caller learns it
        vid = uuid_mod.UUID(payload["id"]) if payload.get("id") else uuid_mod.uuid4()
        payload["id"] = str(vid)
        backend = self.backend_for_id(vid)
        status, body = await self._post_json(
            f"{backend}/vectors?namespace={request.query.get('namespace', 'default')}",
            payload,
        )
        return web.json_response(body, status=status)

    async def upsert_batch(self, request: web.Request) -> web.Response:
        payload = await request.json()
        ns = request.query.get("namespace", "default")
        groups: Dict[str, List[dict]] = {}
        ids = []
        for v in payload.get("vectors", []):
            vid = uuid_mod.UUID(v["id"]) if v.get("id") else uuid_mod.uuid4()
            v["id"] = str(vid)
            ids.append(str(vid))
            groups.setdefault(self.backend_for_id(vid), []).append(v)
        results = await asyncio.gather(
            *[
                self._post_json(f"{b}/vectors/batch?namespace={ns}", {"vectors": vs}, "PUT")
                for b, vs in groups.items()
            ]
        )
        bad = [body for status, body in results if status != 200]
        if bad:
            return web.json_response({"detail": f"partial failure: {bad[0]}"}, status=500)
        return web.json_response(
            {"status": "success", "message": f"{len(ids)} vectors upserted", "ids": ids}
        )

    async def search(self, request: web.Request) -> web.Response:
        payload = await request.json()
        ns = request.query.get("namespace", "default")
        metric = canonical_metric(payload.get("metric", "cosine"))
        top_k = int(payload.get("top_k", 10))
        results = await self._fanout(f"/search?namespace={ns}", payload)
        lists, errors = [], []
        for status, body in results:
            (lists if status == 200 else errors).append(body)
        if errors and not lists:
            return web.json_response(errors[0], status=500)
        return web.json_response(_merge_results(lists, top_k, metric))

    async def delete_vectors(self, request: web.Request) -> web.Response:
        payload = await request.json()
        ns = request.query.get("namespace", "default")
        ids = payload.get("ids", [])
        if not ids:
            return web.json_response({"detail": "No IDs provided"}, status=400)
        groups: Dict[str, List[str]] = {}
        for i in ids:
            groups.setdefault(self.backend_for_id(uuid_mod.UUID(i)), []).append(i)
        results = await asyncio.gather(
            *[
                self._post_json(f"{b}/vectors?namespace={ns}", {"ids": v}, "DELETE")
                for b, v in groups.items()
            ]
        )
        deleted = 0
        for status, body in results:
            if status == 200 and body.get("status") == "success":
                deleted += int(body.get("message", "0 ").split()[0])
        return web.json_response(
            {"status": "success" if deleted else "error", "message": f"{deleted} vectors deleted"}
        )

    async def list_namespaces(self, request: web.Request) -> web.Response:
        results = await self._fanout("/namespaces", None, "GET")
        names = set()
        for status, body in results:
            if status == 200:
                names.update(body.get("namespaces", []))
        return web.json_response({"namespaces": sorted(names)})

    async def storage_info(self, request: web.Request) -> web.Response:
        results = await self._fanout("/storage/info", None, "GET")
        total = size = 0
        per_ns: Dict[str, int] = {}
        shards = []
        for status, body in results:
            if status != 200:
                continue
            total += body.get("total_vectors", 0)
            size += body.get("storage_size_bytes", 0)
            for n, c in (body.get("vectors_per_namespace") or {}).items():
                per_ns[n] = per_ns.get(n, 0) + c
            shards.append(body)
        return web.json_response(
            {
                "storage_type": "tpu_hbm_routed",
                "total_vectors": total,
                "storage_size_bytes": size,
                "namespaces": sorted(per_ns),
                "vectors_per_namespace": per_ns,
                "namespace_count": len(per_ns),
                "backend_count": len(self.backends),
            }
        )

    async def health(self, request: web.Request) -> web.Response:
        results = await self._fanout("/health", None, "GET")
        up = sum(1 for status, body in results if status == 200)
        healthy = up == len(self.backends)
        return web.json_response(
            {
                "status": "healthy" if healthy else "degraded",
                "backends_up": up,
                "backends_total": len(self.backends),
            },
            status=200 if healthy else 503,
        )

    def run(self, host: str = "127.0.0.1", port: int = 8000) -> None:
        web.run_app(self.app, host=host, port=port, print=None)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="mlvectordb-tpu-router")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--backend", action="append", required=True, help="Backend base URL (repeatable)")
    p.add_argument("--api-key", default=None, help="Bearer token forwarded to backends")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    RouterAPI(args.backend, args.api_key).run(args.host, args.port)


if __name__ == "__main__":
    main()
