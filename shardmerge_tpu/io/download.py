"""Async HTTP download manager with partitioned, claim-counted caching.

Parity surface: reference shard/download.py — DownloadStatus (:30-35),
DownloadTask (:37-58), DownloadStats.progress_pct (:60-83),
DownloadManager.cache_file (:140-184) / get_file (:186-230) /
_download_file (:232-292) / add_progress_callback (:294-299) /
_check_progress (:301-341) / cleanup (:343-359).

Improvements over the reference (behavior-compatible):
- 1 MiB streaming chunks instead of 8 KiB (the reference's chunk size makes
  the downloader CPU-bound on large shards).
- optional bounded retries with exponential backoff (reference has none;
  default 0 preserves reference behavior, the CLI enables 3).
- a concurrency semaphore bounding simultaneous connections.
- HuggingFace token authentication (``--token`` / HF_TOKEN /
  ``huggingface-cli login``): the reference's raw shard downloader
  (download.py:241-257) is unauthenticated, so gated repos
  (meta-llama/Mistral) fail with an opaque 401 — here every request
  carries the resolved Bearer token and auth failures raise a loud,
  actionable error instead of retrying.
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple
from urllib.parse import unquote, urlparse

logger = logging.getLogger(__name__)

_CHUNK_SIZE = 1 << 20  # 1 MiB


def resolve_hf_token(token: Optional[str] = None) -> Optional[str]:
    """Resolve a HuggingFace access token: explicit argument, then the
    HF_TOKEN / HUGGING_FACE_HUB_TOKEN environment variables, then the
    huggingface_hub stored login (``$HF_HOME/token``). None when nothing
    is configured (anonymous access — public repos only)."""
    if token:
        return token
    for var in ("HF_TOKEN", "HUGGING_FACE_HUB_TOKEN"):
        v = os.environ.get(var)
        if v:
            return v
    tok_file = (
        Path(os.environ.get("HF_HOME") or Path.home() / ".cache" / "huggingface")
        / "token"
    )
    try:
        v = tok_file.read_text().strip()
    except OSError:
        return None
    return v or None


def hf_auth_headers(token: Optional[str] = None) -> dict:
    """Authorization header dict for HF requests ({} when anonymous)."""
    t = resolve_hf_token(token)
    return {"Authorization": f"Bearer {t}"} if t else {}


def auth_error(status: int, uri: str) -> RuntimeError:
    """A loud, actionable error for HTTP 401/403 on a HF-shaped URL."""
    return RuntimeError(
        f"{uri} returned HTTP {status} — the repo is gated or private. "
        "Pass --token, set HF_TOKEN, or run `huggingface-cli login` "
        "(and accept the repo's license on huggingface.co if gated)."
    )


class DownloadStatus(Enum):
    PENDING = "pending"
    DOWNLOADING = "downloading"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class DownloadTask:
    """One registered download. ``lock`` is held while the transfer runs so
    readers can await completion (reference download.py:37-58)."""

    uri: str
    partition: str
    path: Path
    total_size: int
    downloaded: int
    status: DownloadStatus
    claims: int
    lock: asyncio.Lock
    error: Optional[str] = None  # failure cause, surfaced by get_file


@dataclass
class DownloadStats:
    active_workers: int
    completed_jobs: int
    failed_jobs: int
    total_downloaded: int
    total_size: int

    @property
    def progress_pct(self) -> float:
        if self.total_size == 0:
            return 0.0
        return (self.total_downloaded / self.total_size) * 100


class DownloadManager:
    """Concurrent downloads into per-model partition directories.

    Files stream to ``<name>.tmp``, are size-verified against
    content-length, then atomically renamed (reference download.py:232-292).
    Claim counting allows cache deletion once all readers are done
    (``clean_cache``).
    """

    def __init__(
        self,
        storage_path: Path,
        progress_interval: float = 1.0,
        clean_cache: bool = False,
        http_timeout: float = 3600.0,
        max_retries: int = 0,
        max_concurrent: int = 8,
        token: Optional[str] = None,
    ):
        self.storage_path = Path(storage_path)
        self.progress_interval = progress_interval
        self.last_progress_time = 0.0
        self.clean_cache = clean_cache
        self.http_timeout = http_timeout
        self.max_retries = max_retries
        # every shard stream carries the resolved HF token (gated repos)
        self.headers = hf_auth_headers(token)
        self.downloads: Dict[Tuple[str, str], DownloadTask] = {}
        self.progress_callbacks: List[Callable[[DownloadStats], None]] = []
        self._semaphore = asyncio.Semaphore(max_concurrent)

    # -- helpers ------------------------------------------------------------

    def _clean_filename(self, uri: str) -> str:
        parsed = urlparse(uri)
        return os.path.basename(unquote(parsed.path))

    def _get_partition_path(self, partition: str) -> Path:
        partition_path = self.storage_path / partition
        partition_path.mkdir(parents=True, exist_ok=True)
        return partition_path

    # -- public API ----------------------------------------------------------

    async def cache_file(self, partition: str, uri: str, no_claims: int = 1) -> bool:
        """Register ``uri`` for download into ``partition``.

        Returns True if the file already exists or is in flight, False if a
        new transfer was started. Re-registration resets the claim count
        (reference download.py:152-157).
        """
        download_key = (partition, uri)
        if download_key in self.downloads:
            task = self.downloads[download_key]
            task.claims = no_claims
            return True

        dest_path = self._get_partition_path(partition) / self._clean_filename(uri)
        task = DownloadTask(
            uri=uri,
            partition=partition,
            path=dest_path,
            total_size=0,
            downloaded=0,
            status=DownloadStatus.PENDING,
            claims=no_claims,
            lock=asyncio.Lock(),
        )
        self.downloads[download_key] = task

        if dest_path.exists():
            task.status = DownloadStatus.COMPLETED
            task.total_size = dest_path.stat().st_size
            task.downloaded = task.total_size
            await self._check_progress(force=True)
            return True

        logger.info("Starting download of %s to %s", uri, dest_path)
        await task.lock.acquire()
        asyncio.create_task(self._download_file(download_key))
        return False

    async def get_file(
        self, partition: str, uri: str, claim: bool = True
    ) -> Optional[Path]:
        """Path to a downloaded file; decrements claims and (with
        ``clean_cache``) deletes the file once claims are exhausted.

        Raises RuntimeError for unregistered or failed downloads
        (reference download.py:186-230).
        """
        file_key = (partition, uri)
        if file_key not in self.downloads:
            raise RuntimeError(f"No download registered for {uri}")

        task = self.downloads[file_key]

        if self.clean_cache and task.claims <= 0:
            logger.debug("Removing %s due to zero claims", task.path)
            if task.path.exists():
                task.path.unlink()
            del self.downloads[file_key]
            return None

        if claim:
            task.claims -= 1

        if task.status == DownloadStatus.FAILED:
            cause = f": {task.error}" if task.error else ""
            raise RuntimeError(f"Failed to download {uri}{cause}")
        if task.status == DownloadStatus.COMPLETED:
            return task.path
        return None

    def add_progress_callback(self, callback):
        if not asyncio.iscoroutinefunction(callback):
            raise ValueError("Callback must be a coroutine function")
        self.progress_callbacks.append(callback)

    async def cleanup(self, partition: Optional[str] = None):
        """Delete downloaded files (one partition, or all)."""
        keys_to_remove = []
        for (part, uri), task in self.downloads.items():
            if partition is None or part == partition:
                if task.path.exists():
                    logger.info("Removing cache file: %s", task.path)
                    task.path.unlink()
                keys_to_remove.append((part, uri))
        for key in keys_to_remove:
            del self.downloads[key]

    # -- transfer ------------------------------------------------------------

    async def _download_file(self, download_key: Tuple[str, str]):
        import aiohttp  # deferred: offline paths never need it

        task = self.downloads[download_key]
        temp_path = task.path.with_suffix(task.path.suffix + ".tmp")

        try:
            task.status = DownloadStatus.DOWNLOADING
            await self._check_progress(force=True)

            attempt = 0
            while True:
                try:
                    async with self._semaphore:
                        async with aiohttp.ClientSession(
                            timeout=aiohttp.ClientTimeout(total=self.http_timeout),
                            headers=self.headers,
                        ) as session:
                            async with session.get(task.uri) as response:
                                if response.status in (401, 403):
                                    raise auth_error(
                                        response.status, task.uri
                                    )
                                response.raise_for_status()
                                content_length = response.headers.get("content-length")
                                task.total_size = (
                                    int(content_length) if content_length else 0
                                )
                                task.downloaded = 0
                                with open(temp_path, "wb") as f:
                                    async for chunk in response.content.iter_chunked(
                                        _CHUNK_SIZE
                                    ):
                                        if chunk:
                                            f.write(chunk)
                                            task.downloaded += len(chunk)
                                            await self._check_progress()

                    if temp_path.stat().st_size != task.total_size:
                        raise RuntimeError(
                            "Downloaded size does not match content-length for "
                            f"{task.uri}"
                        )
                    break
                except Exception as e:
                    # auth failures are not transient: retrying a 401/403
                    # just delays the actionable message
                    if getattr(e, "status", None) in (401, 403) or isinstance(
                        e, RuntimeError
                    ) and "gated or private" in str(e):
                        raise
                    if attempt >= self.max_retries:
                        raise
                    attempt += 1
                    backoff = min(2.0**attempt, 30.0)
                    logger.warning(
                        "Download of %s failed (attempt %d/%d); retrying in %.0fs",
                        task.uri,
                        attempt,
                        self.max_retries,
                        backoff,
                    )
                    await asyncio.sleep(backoff)

            os.replace(temp_path, task.path)
            task.status = DownloadStatus.COMPLETED
            logger.info("Download completed for %s -> %s", task.uri, task.path)

        except Exception as e:
            task.status = DownloadStatus.FAILED
            task.error = str(e)
            logger.error("Download failed for %s: %s", task.uri, e)
            if temp_path.exists():
                temp_path.unlink()
        finally:
            await self._check_progress(force=True)
            task.lock.release()

    async def _check_progress(self, force: bool = False):
        current_time = time.time()
        if not force and (
            current_time - self.last_progress_time < self.progress_interval
        ):
            return
        self.last_progress_time = current_time

        active = completed = failed = 0
        total_downloaded = total_size = 0
        for task in self.downloads.values():
            if task.status == DownloadStatus.DOWNLOADING:
                active += 1
                total_downloaded += task.downloaded
                total_size += task.total_size
            elif task.status == DownloadStatus.COMPLETED:
                completed += 1
            elif task.status == DownloadStatus.FAILED:
                failed += 1

        stats = DownloadStats(
            active_workers=active,
            completed_jobs=completed,
            failed_jobs=failed,
            total_downloaded=total_downloaded,
            total_size=total_size,
        )
        logger.debug(
            "Download stats - Active: %d, Completed: %d, Failed: %d, "
            "Progress: %.1f%%",
            active,
            completed,
            failed,
            stats.progress_pct,
        )
        for callback in self.progress_callbacks:
            await callback(stats)
