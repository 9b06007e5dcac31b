"""HTTP serving daemon around the inference services.

The reference ships research scripts only; this is the deployment surface
for the trained artifacts: a dependency-free (stdlib ``http.server``)
threaded daemon exposing the three services of :mod:`serve`:

    POST /v1/retrieve     → {"scores": [[...]], "indices": [[...]]}
    POST /v1/reconstruct  → .npz bytes  {"images": (B, H, W, 3) float32}
    POST /v1/caption      → {"captions": ["..."]}
    GET  /healthz         → {"ok": true, "services": [...]}

Request bodies are either JSON (``{"eeg": [[[...]]], "subject_ids": [...],
"k": 5, "seed": 0}``) or ``application/octet-stream`` carrying an ``.npz``
with ``eeg``/``subject_ids`` arrays (binary path — no JSON float overhead;
use it for real batches).

Design notes:
- One chip, one compiled program per service: requests of any size are
  chunked by each service's ``max_batch`` (see :mod:`serve`), and a global
  lock serializes device work — HTTP threads handle I/O concurrently while
  the TPU executes one request at a time, which is also the fairness model
  a single-chip deployment wants.
- The daemon owns no model code: anything accepted by the ``serve``
  services (any encoder from the registry, any prior/generator) plugs in.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class EEGDecodeServer:
    """Bundle of optional services behind one HTTP daemon.

    Pass any subset of ``retrieval``/``reconstruction``/``caption``
    (instances from :mod:`eeg_image_decode_tpu.serve`); routes for absent
    services return 404.
    """

    def __init__(self, *, retrieval=None, reconstruction=None, caption=None):
        self.retrieval = retrieval
        self.reconstruction = reconstruction
        self.caption = caption
        self._device_lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ——— request decoding ———

    @staticmethod
    def _parse(body: bytes, content_type: str) -> dict:
        if "octet-stream" in content_type:
            with np.load(io.BytesIO(body), allow_pickle=False) as z:
                out = {k: z[k] for k in z.files}
            # scalars ride along as 0-d arrays
            for k in ("k", "seed"):
                if k in out:
                    out[k] = int(np.asarray(out[k]))
            return out
        req = json.loads(body.decode("utf-8"))
        if "eeg" in req:
            req["eeg"] = np.asarray(req["eeg"], np.float32)
        if "subject_ids" in req:
            req["subject_ids"] = np.asarray(req["subject_ids"], np.int32)
        return req

    @staticmethod
    def _require(req: dict, *keys) -> list:
        missing = [k for k in keys if k not in req]
        if missing:
            raise ValueError(f"missing field(s): {missing}")
        return [req[k] for k in keys]

    # ——— handlers ———

    def _handle(self, route: str, req: dict) -> tuple[bytes, str]:
        """→ (response body, content type)."""
        if route == "/v1/retrieve":
            if self.retrieval is None:
                raise LookupError("retrieval service not configured")
            eeg, sids = self._require(req, "eeg", "subject_ids")
            with self._device_lock:
                scores, idx = self.retrieval.top_k(
                    eeg, sids, k=int(req.get("k", 5))
                )
            return (
                json.dumps(
                    {"scores": scores.tolist(), "indices": idx.tolist()}
                ).encode(),
                "application/json",
            )
        if route == "/v1/reconstruct":
            if self.reconstruction is None:
                raise LookupError("reconstruction service not configured")
            eeg, sids = self._require(req, "eeg", "subject_ids")
            with self._device_lock:
                imgs = self.reconstruction.reconstruct(
                    eeg, sids, seed=int(req.get("seed", 0))
                )
            buf = io.BytesIO()
            np.savez_compressed(buf, images=np.asarray(imgs, np.float32))
            return buf.getvalue(), "application/octet-stream"
        if route == "/v1/caption":
            if self.caption is None:
                raise LookupError("caption service not configured")
            eeg, sids = self._require(req, "eeg", "subject_ids")
            with self._device_lock:
                caps = self.caption.caption(
                    eeg, sids, seed=int(req.get("seed", 0))
                )
            return (
                json.dumps({"captions": caps}).encode(),
                "application/json",
            )
        raise FileNotFoundError(route)

    # ——— daemon plumbing ———

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    services = [
                        n for n in ("retrieval", "reconstruction", "caption")
                        if getattr(server, n) is not None
                    ]
                    self._send(
                        200,
                        json.dumps({"ok": True, "services": services}).encode(),
                        "application/json",
                    )
                else:
                    self._send(404, b'{"error": "not found"}',
                               "application/json")

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    req = server._parse(
                        body, self.headers.get("Content-Type", "")
                    )
                    out, ctype = server._handle(self.path, req)
                    self._send(200, out, ctype)
                except FileNotFoundError:
                    self._send(404, b'{"error": "not found"}',
                               "application/json")
                except LookupError as e:
                    self._send(
                        501, json.dumps({"error": str(e)}).encode(),
                        "application/json",
                    )
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    self._send(
                        400, json.dumps({"error": str(e)}).encode(),
                        "application/json",
                    )
                except Exception as e:  # device-side failures → 500
                    self._send(
                        500, json.dumps({"error": str(e)}).encode(),
                        "application/json",
                    )

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start in a daemon thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8080):
        """Blocking variant (the CLI entry point)."""
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._httpd.serve_forever()

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
