"""Local HTTP serving endpoint for merged models.

Beyond-reference capability: the reference's only inference surface is the
`generate` CLI (shard/__main__.py:254-297, one prompt per process). This
module serves a merged model over HTTP with an OpenAI-compatible completions
shape, so a merge can be smoke-tested or load-tested without re-loading
weights per prompt:

- ``POST /v1/completions`` — ``{"prompt": str | [str, ...], "max_tokens",
  "temperature", "top_p", "top_k", "repetition_penalty", "greedy", "seed"}``
  → ``{"choices": [{"index", "text", "finish_reason"}, ...]}`` with
  ``finish_reason`` "stop" (EOS) or "length" (max_tokens truncation).
  Every request — single or list prompt — runs the batched decode path
  (InferenceEngine.generate_batch): one jitted lockstep decode per batch.
  Batch size and prompt length are capped (_MAX_BATCH/_MAX_PROMPT_CHARS):
  each new (batch, length) shape is a fresh XLA compile, so unbounded
  requests could stall the device lock for minutes.
- ``GET /v1/models`` / ``GET /health`` — model id + readiness.

Design notes (TPU-first): requests are served strictly one at a time
(``ThreadingHTTPServer`` accepts concurrently, a lock serializes device
work — the jitted decode already saturates the chip; interleaving requests
would only thrash the compile cache with new batch shapes). Batch requests
amortize prefill+decode dispatches across prompts instead.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["ModelServer", "serve"]

_MAX_BODY = 32 * 1024 * 1024
_MAX_BATCH = 64  # one compile per batch shape; cap what a request can cost
_MAX_PROMPT_CHARS = 256 * 1024  # bounds prompt length and so the KV cache


class ModelServer:
    """Wraps an InferenceEngine behind a ThreadingHTTPServer."""

    def __init__(self, engine, model_id: str = "shardmerge-tpu"):
        self.engine = engine
        self.model_id = model_id
        self.port: Optional[int] = None  # bound port once start()ed
        self._device_lock = threading.Lock()
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- request handling ---------------------------------------------------

    def _validate(self, payload: dict):
        """Parse + validate a completions payload. Raises ValueError (HTTP
        400) on caller mistakes; generation itself runs in _generate so
        engine failures surface as 500s, not as 'bad request'."""
        prompt = payload.get("prompt")
        if prompt is None:
            raise ValueError("missing 'prompt'")
        prompts = prompt if isinstance(prompt, list) else [prompt]
        if not prompts:
            raise ValueError("'prompt' list is empty")
        if len(prompts) > _MAX_BATCH:
            raise ValueError(f"at most {_MAX_BATCH} prompts per request")
        if not all(isinstance(p, str) and p for p in prompts):
            raise ValueError("'prompt' entries must be non-empty strings")
        if any(len(p) > _MAX_PROMPT_CHARS for p in prompts):
            raise ValueError(f"prompts are capped at {_MAX_PROMPT_CHARS} chars")

        try:
            kwargs = dict(
                max_new_tokens=int(payload.get("max_tokens", 128)),
                temperature=float(payload.get("temperature", 0.7)),
                top_p=float(payload.get("top_p", 0.95)),
                top_k=int(payload.get("top_k", 40)),
                repetition_penalty=float(payload.get("repetition_penalty", 1.1)),
                greedy=bool(payload.get("greedy", False)),
                seed=int(payload.get("seed", 0)),
                use_template=bool(payload.get("use_template", False)),
            )
        except (TypeError, ValueError):
            raise ValueError("sampling parameters must be numeric")
        if kwargs["max_new_tokens"] < 1 or kwargs["max_new_tokens"] > 4096:
            raise ValueError("max_tokens must be in [1, 4096]")
        if kwargs["top_k"] < 0:
            raise ValueError("top_k must be >= 0")
        # lax.top_k rejects k > vocab; clamping matches the 'consider
        # everything' intent of a huge top_k
        kwargs["top_k"] = min(kwargs["top_k"], self.engine.cfg.vocab_size)
        return prompts, kwargs

    def _generate(self, prompts, kwargs) -> dict:
        with self._device_lock:
            if (
                len(prompts) == 1
                and kwargs.get("greedy")
                and self.engine.draft_cfg is not None
            ):
                # single greedy prompt + loaded draft: speculative decoding
                # (generate_batch has no speculative path)
                meta: dict = {}
                text = "".join(
                    self.engine.stream_generation(
                        prompts[0],
                        system_prompt=None,
                        previous_messages=None,
                        meta=meta,
                        **kwargs,
                    )
                )
                texts, reasons = [text], [meta["finish_reason"]]
            else:
                # batched lockstep path; finish_reason comes back per row
                texts, reasons = self.engine.generate_batch(
                    prompts, return_meta=True, **kwargs
                )
        return {
            "object": "text_completion",
            "model": self.model_id,
            "choices": [
                {"index": i, "text": t, "finish_reason": r}
                for i, (t, r) in enumerate(zip(texts, reasons))
            ],
        }

    # -- server lifecycle ---------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving in background threads; returns the bound port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route to logging, not stderr
                logger.debug("http: " + fmt, *args)

            def _send(self, code: int, body: dict):
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path in ("/health", "/"):
                    self._send(200, {"status": "ok", "model": server.model_id})
                elif self.path == "/v1/models":
                    self._send(
                        200,
                        {
                            "object": "list",
                            "data": [
                                {"id": server.model_id, "object": "model"}
                            ],
                        },
                    )
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path not in ("/v1/completions", "/completions"):
                    self._send(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length > _MAX_BODY:
                        self._send(413, {"error": "request body too large"})
                        return
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    if not isinstance(payload, dict):
                        raise ValueError("body must be a JSON object")
                    prompts, kwargs = server._validate(payload)
                except (ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": str(e)})
                    return
                try:
                    self._send(200, server._generate(prompts, kwargs))
                except Exception as e:  # device/engine failure: loud 500
                    logger.exception("completion failed")
                    self._send(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        thread.start()
        self.port = self._httpd.server_address[1]
        logger.info("Serving %s on http://%s:%d", self.model_id, host, self.port)
        return self.port

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def serve(
    model_path: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    load_in_4bit: bool = False,
    load_in_8bit: bool = False,
    draft_model: Optional[str] = None,
    speculation_k: int = 4,
    shard: bool = False,
) -> ModelServer:
    """Load a model and start the HTTP server (CLI entry). ``draft_model``
    enables speculative decoding for greedy single-prompt requests;
    ``shard`` tensor-parallelizes the model over all visible devices."""
    from .inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(
        model_path,
        load_in_4bit=load_in_4bit,
        load_in_8bit=load_in_8bit,
        draft_model=draft_model,
        speculation_k=speculation_k,
        shard=shard,
    )
    server = ModelServer(engine, model_id=str(model_path))
    server.start(host, port)
    return server
