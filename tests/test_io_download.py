"""DownloadManager tests against a real local aiohttp server (the reference
fakes aiohttp with aioresponses; a live localhost server covers the same
paths — success, 404, content-length mismatch, .tmp lifecycle — with zero
egress)."""

import asyncio
from pathlib import Path

import pytest
from aiohttp import web

from shardmerge_tpu.io.download import DownloadManager, DownloadStatus


class LocalServer:
    """Tiny aiohttp server serving byte blobs with configurable failures."""

    def __init__(self):
        self.blobs = {}
        self.bad_length = set()  # paths that lie about content-length
        self.hits = {}
        self.auth = {}  # path -> last Authorization header seen (or None)
        self.require_token = None  # set: Bearer <token> required, else 401

    async def handler(self, request):
        path = request.path
        self.hits[path] = self.hits.get(path, 0) + 1
        self.auth[path] = request.headers.get("Authorization")
        if (
            self.require_token is not None
            and self.auth[path] != f"Bearer {self.require_token}"
        ):
            return web.Response(status=401)
        if path not in self.blobs:
            return web.Response(status=404)
        data = self.blobs[path]
        if path in self.bad_length:
            resp = web.StreamResponse(
                headers={"Content-Length": str(len(data) + 10)}
            )
            await resp.prepare(request)
            await resp.write(data)
            # abort the connection without sending the promised extra bytes
            request.transport.close()
            return resp
        return web.Response(body=data)

    async def __aenter__(self):
        app = web.Application()
        app.router.add_get("/{tail:.*}", self.handler)
        self.runner = web.AppRunner(app)
        await self.runner.setup()
        site = web.TCPSite(self.runner, "127.0.0.1", 0)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        self.base = f"http://127.0.0.1:{self.port}"
        return self

    async def __aexit__(self, *exc):
        await self.runner.cleanup()


async def _wait_done(manager, key, timeout=10.0):
    task = manager.downloads[key]
    async with asyncio.timeout(timeout):
        async with task.lock:
            pass
    return task


def test_download_success_and_rename(tmp_path):
    async def main():
        async with LocalServer() as server:
            server.blobs["/m/shard.bin"] = b"x" * 100_000
            manager = DownloadManager(storage_path=tmp_path)
            uri = f"{server.base}/m/shard.bin"
            fresh = await manager.cache_file("model-a", uri, no_claims=2)
            assert fresh is False  # new download started
            task = await _wait_done(manager, ("model-a", uri))
            assert task.status == DownloadStatus.COMPLETED
            path = await manager.get_file("model-a", uri)
            assert path == tmp_path / "model-a" / "shard.bin"
            assert path.read_bytes() == b"x" * 100_000
            assert not path.with_suffix(".bin.tmp").exists()
            assert task.claims == 1  # claim decremented

    asyncio.run(main())


def test_download_404_fails(tmp_path):
    async def main():
        async with LocalServer() as server:
            manager = DownloadManager(storage_path=tmp_path)
            uri = f"{server.base}/missing.bin"
            await manager.cache_file("m", uri)
            task = await _wait_done(manager, ("m", uri))
            assert task.status == DownloadStatus.FAILED
            with pytest.raises(RuntimeError, match="Failed to download"):
                await manager.get_file("m", uri)

    asyncio.run(main())


def test_content_length_mismatch_fails_and_removes_tmp(tmp_path):
    async def main():
        async with LocalServer() as server:
            server.blobs["/m/x.bin"] = b"y" * 5000
            server.bad_length.add("/m/x.bin")
            manager = DownloadManager(storage_path=tmp_path)
            uri = f"{server.base}/m/x.bin"
            await manager.cache_file("m", uri)
            task = await _wait_done(manager, ("m", uri))
            assert task.status == DownloadStatus.FAILED
            assert not (tmp_path / "m" / "x.bin").exists()
            assert not (tmp_path / "m" / "x.bin.tmp").exists()

    asyncio.run(main())


def test_retries_recover(tmp_path):
    async def main():
        async with LocalServer() as server:
            # first attempt 404s, then the blob "appears"
            manager = DownloadManager(storage_path=tmp_path, max_retries=3)
            uri = f"{server.base}/m/later.bin"

            async def add_blob_soon():
                await asyncio.sleep(0.5)
                server.blobs["/m/later.bin"] = b"z" * 64

            asyncio.create_task(add_blob_soon())
            await manager.cache_file("m", uri)
            task = await _wait_done(manager, ("m", uri), timeout=30)
            assert task.status == DownloadStatus.COMPLETED

    asyncio.run(main())


def test_existing_file_reused(tmp_path):
    async def main():
        dest = tmp_path / "m" / "shard.bin"
        dest.parent.mkdir(parents=True)
        dest.write_bytes(b"cached")
        manager = DownloadManager(storage_path=tmp_path)
        uri = "http://127.0.0.1:1/m/shard.bin"  # unreachable: must not be hit
        assert await manager.cache_file("m", uri) is True
        task = manager.downloads[("m", uri)]
        assert task.status == DownloadStatus.COMPLETED
        assert await manager.get_file("m", uri) == dest

    asyncio.run(main())


def test_clean_cache_deletes_on_zero_claims(tmp_path):
    async def main():
        dest = tmp_path / "m" / "s.bin"
        dest.parent.mkdir(parents=True)
        dest.write_bytes(b"d")
        manager = DownloadManager(storage_path=tmp_path, clean_cache=True)
        uri = "http://127.0.0.1:1/m/s.bin"
        await manager.cache_file("m", uri, no_claims=1)
        assert await manager.get_file("m", uri) == dest  # claim -> 0
        assert await manager.get_file("m", uri, claim=False) is None  # deleted
        assert not dest.exists()

    asyncio.run(main())


def test_progress_callbacks(tmp_path):
    async def main():
        async with LocalServer() as server:
            server.blobs["/m/p.bin"] = b"q" * 10_000
            manager = DownloadManager(storage_path=tmp_path, progress_interval=0.0)
            seen = []

            async def cb(stats):
                seen.append(stats)

            manager.add_progress_callback(cb)
            with pytest.raises(ValueError):
                manager.add_progress_callback(lambda s: None)  # not a coroutine
            uri = f"{server.base}/m/p.bin"
            await manager.cache_file("m", uri)
            await _wait_done(manager, ("m", uri))
            assert seen
            assert seen[-1].completed_jobs == 1

    asyncio.run(main())


def test_cleanup_removes_files(tmp_path):
    async def main():
        for part in ["a", "b"]:
            d = tmp_path / part
            d.mkdir()
            (d / "f.bin").write_bytes(b"1")
        manager = DownloadManager(storage_path=tmp_path)
        await manager.cache_file("a", "http://127.0.0.1:1/f.bin")
        await manager.cache_file("b", "http://127.0.0.1:1/f.bin")
        await manager.cleanup(partition="a")
        assert not (tmp_path / "a" / "f.bin").exists()
        assert (tmp_path / "b" / "f.bin").exists()
        await manager.cleanup()
        assert not (tmp_path / "b" / "f.bin").exists()
        assert manager.downloads == {}

    asyncio.run(main())


def _no_ambient_hf_auth(monkeypatch, tmp_path):
    """Make token resolution deterministic: no env vars, empty HF_HOME."""
    monkeypatch.delenv("HF_TOKEN", raising=False)
    monkeypatch.delenv("HUGGING_FACE_HUB_TOKEN", raising=False)
    hf_home = tmp_path / "hfhome"
    hf_home.mkdir(exist_ok=True)
    monkeypatch.setenv("HF_HOME", str(hf_home))
    return hf_home


def test_hf_token_resolution_order(tmp_path, monkeypatch):
    from shardmerge_tpu.io.download import resolve_hf_token

    hf_home = _no_ambient_hf_auth(monkeypatch, tmp_path)
    assert resolve_hf_token() is None
    (hf_home / "token").write_text("stored\n")  # huggingface-cli login
    assert resolve_hf_token() == "stored"
    monkeypatch.setenv("HF_TOKEN", "envtok")  # env beats the stored login
    assert resolve_hf_token() == "envtok"
    assert resolve_hf_token("explicit") == "explicit"  # --token beats all


def test_token_rides_shard_requests_and_401_is_actionable(
    tmp_path, monkeypatch
):
    """Gated-repo shape: without a token the 401 surfaces an actionable
    error WITHOUT burning retries; with the token every request carries
    the Authorization header and the download succeeds."""
    _no_ambient_hf_auth(monkeypatch, tmp_path)

    async def main():
        async with LocalServer() as server:
            server.blobs["/m/g.bin"] = b"s" * 1024
            server.require_token = "sekret"
            uri = f"{server.base}/m/g.bin"

            m0 = DownloadManager(storage_path=tmp_path / "s0", max_retries=3)
            await m0.cache_file("p", uri)
            await _wait_done(m0, ("p", uri))
            with pytest.raises(RuntimeError, match="HF_TOKEN"):
                await m0.get_file("p", uri)
            assert server.hits["/m/g.bin"] == 1  # auth failures never retry

            m1 = DownloadManager(storage_path=tmp_path / "s1", token="sekret")
            await m1.cache_file("p", uri)
            await _wait_done(m1, ("p", uri))
            path = await m1.get_file("p", uri)
            assert path.read_bytes() == b"s" * 1024
            assert server.auth["/m/g.bin"] == "Bearer sekret"

    asyncio.run(main())
