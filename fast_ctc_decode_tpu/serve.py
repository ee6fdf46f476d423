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
typed: input errors (bad params/shape/JSON, search failures on the given
input) map to HTTP 400, server-side faults to 500, and the body is always
structured ``{"error": "..."}``.

Request schema:
    {
      "method": "beam_search" | "viterbi_search",
      "posteriors": [f32, ...],        # flattened row-major
      "shape": [T, A],                 # or [B, T, A] for a batch
      "lengths": [int, ...],           # optional, batch only
      "alphabet": ["N", "A", ...],
      "beam_size": 5,                  # beam_search only
      "beam_cut_threshold": 0.0,       # beam_search only
      "collapse_repeats": true,
      "qstring": false,                # viterbi_search only
      "qscale": 1.0, "qbias": 0.0      # viterbi_search only
    }
Response: {"seq": str, "starts": [int, ...]} — reference schema
(src/lib.rs:99, 137).  Batch requests (3-d shape) return
{"results": [{"seq": ..., "starts": ..., "err": 0}, ...]} and route
through the mesh-sharded batch pipeline, so one HTTP call amortizes the
device dispatch over B reads (per-read error codes; a bad read never
aborts the batch).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np

from . import api, errors


def _decode_single(req: Dict[str, Any], posteriors: np.ndarray) -> Dict[str, Any]:
    method = req.get("method", "beam_search")
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


_DECODER_CACHE: Dict[Tuple, Any] = {}
_DECODER_CACHE_MAX = 16


def _cache_put(key, value):
    """Insert with a FIFO bound so a long-running server cannot pin an
    unbounded set of compiled decoders."""
    if len(_DECODER_CACHE) >= _DECODER_CACHE_MAX:
        _DECODER_CACHE.pop(next(iter(_DECODER_CACHE)))
    _DECODER_CACHE[key] = value


def _decode_batch(req: Dict[str, Any], posteriors: np.ndarray) -> Dict[str, Any]:
    """[B, T, A] request through the batch pipeline (decoders cached per
    static config so repeated requests reuse the compiled kernel)."""
    from .parallel import pipeline

    method = req.get("method", "beam_search")
    B, T, _ = posteriors.shape
    alphabet = tuple(req["alphabet"])
    lengths = np.asarray(req.get("lengths", [T] * B), np.int32)
    if lengths.shape != (B,):
        raise ValueError("lengths must have one entry per read")
    if np.any(lengths < 0) or np.any(lengths > T):
        raise ValueError("lengths must be in [0, T]")

    # round T up to a power-of-two bucket edge so requests with naturally
    # varying read lengths share compiled decoders instead of compiling per
    # T (per-read ``lengths`` keep the decode exact on the padded frames)
    Tb = pipeline._bucket_edge_for(T)
    if Tb > T:
        posteriors = np.concatenate(
            [posteriors, np.zeros((B, Tb - T, posteriors.shape[2]), np.float32)],
            axis=1,
        )
        T = Tb

    # pad to a full device batch with length-0 dummy reads (decoded empty)
    from .parallel.mesh import make_data_mesh

    n_dev = len(make_data_mesh().devices.reshape(-1))
    pad = (-B) % n_dev
    if pad:
        posteriors = np.concatenate(
            [posteriors, np.zeros((pad, T, posteriors.shape[2]), np.float32)]
        )
        lengths = np.concatenate([lengths, np.zeros((pad,), np.int32)])

    if method == "beam_search":
        key = (
            "beam", alphabet, T,
            int(req.get("beam_size", 5)),
            float(req.get("beam_cut_threshold", 0.0)),
            bool(req.get("collapse_repeats", True)),
        )
        if key not in _DECODER_CACHE:
            _cache_put(key, pipeline.BatchBeamDecoder(
                list(alphabet), T=T, beam_size=key[3],
                beam_cut_threshold=key[4], collapse_repeats=key[5],
            ))
        dec = _DECODER_CACHE[key]
        res = dec.decode(posteriors, lengths)[:B]
        return {
            "results": [
                {"seq": s, "starts": p, "err": int(e)} for s, p, e in res
            ]
        }
    if method == "viterbi_search":
        key = (
            "viterbi", alphabet, T,
            bool(req.get("collapse_repeats", True)),
            float(req.get("qscale", 1.0)),
            float(req.get("qbias", 0.0)),
        )
        if key not in _DECODER_CACHE:
            _cache_put(key, pipeline.BatchViterbiDecoder(
                list(alphabet), T=T, collapse_repeats=key[3],
                qscale=key[4], qbias=key[5],
            ))
        dec = _DECODER_CACHE[key]
        res = dec.decode(
            posteriors, lengths, qstring=bool(req.get("qstring", False))
        )[:B]
        return {
            "results": [{"seq": s, "starts": p, "err": 0} for s, p in res]
        }
    raise ValueError(f"unknown method {method!r}")


def decode_request(req: Dict[str, Any]) -> Dict[str, Any]:
    """Execute one decode request dict; returns the response dict.

    Raises ValueError/TypeError/KeyError/SearchError exactly like the Python
    API — callers map these to protocol errors.
    """
    shape = req["shape"]
    posteriors = np.asarray(req["posteriors"], np.float32)
    if len(shape) == 2:
        return _decode_single(req, posteriors.reshape(shape))
    if len(shape) == 3:
        return _decode_batch(req, posteriors.reshape(shape))
    raise ValueError("shape must be [T, A] or [B, T, A]")


def handle_json(request_json: str) -> Tuple[str, int]:
    """String-in entry point: returns (response_json, http_status).

    Input-derived failures (malformed JSON/params, search errors on the
    given posteriors) are 400; anything unexpected is a 500.
    """
    try:
        req = json.loads(request_json)
        return json.dumps(decode_request(req)), 200
    except (
        ValueError,  # includes json.JSONDecodeError and API validation
        TypeError,
        KeyError,
        errors.SearchError,  # RuntimeError subclass: input-induced
    ) as e:
        return json.dumps({"error": f"{type(e).__name__}: {e}"}), 400
    except Exception as e:  # pragma: no cover - server-side fault
        return json.dumps({"error": f"{type(e).__name__}: {e}"}), 500


def decode_json(request_json: str) -> str:
    """String-in/string-out entry point (the js_beam_search analog)."""
    return handle_json(request_json)[0]


def serve_http(host: str = "127.0.0.1", port: int = 8000):
    """Threaded stdlib HTTP server: POST / with a request JSON body.

    Threads overlap host-side JSON/detok work across requests; device
    decodes serialize on the JAX dispatch lock, so throughput-minded
    clients should send batch (3-d shape) requests.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8")
            out, code = handle_json(body)
            data = out.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    httpd = ThreadingHTTPServer((host, port), Handler)
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
