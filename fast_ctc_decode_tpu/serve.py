"""JSON decode service — the TPU-native analog of the reference's WASM/JS
binding layer (C2 in SURVEY.md §2).

The reference ships ``js_beam_search`` / ``js_viterbi_search``
(/root/reference/src/lib.rs:63-140): browser/Node callers pass a flattened
f32 posterior array + shape + params and get back the JSON string
``{"seq": ..., "starts": [...]}``.  A WASM build makes no sense for a TPU
engine, so the non-Python binding surface is a wire protocol instead: the
same request/response schema over stdin/stdout or HTTP, with decodes
running on the accelerator.  Unlike the reference's weak error handling
(it returns the string "Error" and logs — src/lib.rs:78-88), failures are
structured: ``{"error": "..."}`` with an HTTP 4xx/5xx status.

Request schema (both endpoints):
    {
      "method": "beam_search" | "viterbi_search",
      "posteriors": [f32, ...],        # flattened row-major [T, A]
      "shape": [T, A],
      "alphabet": ["N", "A", ...],
      "beam_size": 5,                  # beam_search only
      "beam_cut_threshold": 0.0,       # beam_search only
      "collapse_repeats": true,
      "qstring": false,                # viterbi_search only
      "qscale": 1.0, "qbias": 0.0      # viterbi_search only
    }
Response: {"seq": str, "starts": [int, ...]} — reference schema
(src/lib.rs:99, 137).
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

from . import api


def decode_request(req: Dict[str, Any]) -> Dict[str, Any]:
    """Execute one decode request dict; returns the response dict.

    Raises ValueError/TypeError/RuntimeError exactly like the Python API —
    callers map these to protocol errors.
    """
    method = req.get("method", "beam_search")
    shape = req["shape"]
    if len(shape) != 2:
        raise ValueError("shape must be [T, A]")
    posteriors = np.asarray(req["posteriors"], np.float32).reshape(shape)
    alphabet = req["alphabet"]

    if method == "beam_search":
        seq, starts = api.beam_search(
            posteriors,
            alphabet,
            int(req.get("beam_size", 5)),
            float(req.get("beam_cut_threshold", 0.0)),
            bool(req.get("collapse_repeats", True)),
        )
    elif method == "viterbi_search":
        seq, starts = api.viterbi_search(
            posteriors,
            alphabet,
            bool(req.get("qstring", False)),
            float(req.get("qscale", 1.0)),
            float(req.get("qbias", 0.0)),
            bool(req.get("collapse_repeats", True)),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return {"seq": seq, "starts": list(starts)}


def decode_json(request_json: str) -> str:
    """String-in/string-out entry point (the js_beam_search analog)."""
    try:
        req = json.loads(request_json)
        return json.dumps(decode_request(req))
    except Exception as e:  # structured errors instead of "Error"
        return json.dumps({"error": f"{type(e).__name__}: {e}"})


def serve_http(host: str = "127.0.0.1", port: int = 8000):
    """Minimal stdlib HTTP server: POST / with a request JSON body."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8")
            out = decode_json(body)
            code = 400 if out.startswith('{"error"') else 200
            data = out.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    httpd = HTTPServer((host, port), Handler)
    print(f"fast_ctc_decode_tpu serving on http://{host}:{port}")
    httpd.serve_forever()


def main():
    """CLI: one JSON request per stdin line -> one JSON response per line,
    or --http [host:port] for the HTTP server."""
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--http":
        hp = sys.argv[2] if len(sys.argv) > 2 else "127.0.0.1:8000"
        host, _, port = hp.partition(":")
        serve_http(host, int(port or 8000))
        return
    for line in sys.stdin:
        line = line.strip()
        if line:
            print(decode_json(line), flush=True)


if __name__ == "__main__":
    main()
