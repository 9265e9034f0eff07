"""Batched-inference stage slot: micro-batch HTTP enrichment.

The reference exposes ``picture_description_api`` — describe pictures
by POSTing them to an external VLM endpoint with a client-side
``concurrency`` knob (/root/reference/docs/usage.md:37-41,51; options
surface datamodel/requests.py).  This module is that stage re-expressed
Spark-first: a mapInPandas kernel that

1. decodes REAL pixels (media.decode_rgb → dominant-channel features),
2. groups rows into micro-batches of ``batch_size`` features,
3. POSTs each micro-batch as JSON with ``concurrency`` in-flight
   requests per task (ThreadPoolExecutor), bounded retries with
   deterministic backoff and a per-request timeout,
4. joins descriptions back by doc_id; exhausted retries yield NULL
   descriptions (abort_on_error=false semantics — the job never dies
   on a flaky endpoint).

With ``endpoint=None`` the LOCAL deterministic engine computes the
identical description formula — the no-network fallback the oracle
gate scores.  At 100 TB the knob that matters is per-task concurrency
× task count: total in-flight = concurrency × executors, so the
cluster-wide request rate is controlled from the job conf without a
coordinator; payload bytes never shuffle (the kernel is a narrow map).

The mock server below is a TEST double (deterministic, in-process)
implementing the same contract, so the HTTP path is exercised
end-to-end in pytest without a real VLM.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DESCRIBE_SCHEMA = ("doc_id bigint, label string, n_px bigint, "
                   "description string")


def describe_from_features(label: str, n_px: int) -> str:
    """The deterministic description formula — the single source of
    truth shared by the local engine, the mock server, and the DuckDB
    oracle ('a <label> picture of <n_px> px')."""
    return f"a {label} picture of {n_px} px"


def _features(media: bytes | None) -> tuple[str, int]:
    """Dominant-channel label + pixel count from REAL decoded pixels
    (same rule as media.picture_classify); undecodable → ('unknown', 0)."""
    from .media import image_raster_stats
    st = image_raster_stats(media if media is not None else b"")
    if st is None:
        return ("unknown", 0)
    r, g, b = st["r_mean"], st["g_mean"], st["b_mean"]
    label = ("red" if r >= g and r >= b
             else "green" if g >= b else "blue")
    return (label, st["n_px"])


def _post_batch(endpoint: str, feats: list[dict], timeout_s: float,
                retries: int) -> dict[int, str | None]:
    """POST one micro-batch; bounded retries with deterministic
    linear backoff.  Returns {doc_id: description|None}."""
    import time
    import urllib.error
    import urllib.request

    body = json.dumps(feats).encode()
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(
                endpoint, data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                out = json.loads(resp.read())
            return {int(o["doc_id"]): o.get("description") for o in out}
        except (urllib.error.URLError, OSError, TimeoutError,
                json.JSONDecodeError, KeyError, ValueError):
            if attempt < retries:
                time.sleep(0.05 * (attempt + 1))
    return {int(f["doc_id"]): None for f in feats}


def picture_describe(df: DataFrame, endpoint: str | None = None,
                     concurrency: int = 4, batch_size: int = 32,
                     timeout_s: float = 5.0,
                     retries: int = 2) -> DataFrame:
    """df(doc_id, media:binary) → (doc_id, label, n_px, description).

    endpoint=None runs the local deterministic engine; otherwise each
    Spark task keeps ``concurrency`` micro-batch POSTs in flight."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            feats = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                label, n_px = _features(m)
                feats.append({"doc_id": int(did), "label": label,
                              "n_px": n_px})
            if endpoint is None:
                desc = {f["doc_id"]:
                        describe_from_features(f["label"], f["n_px"])
                        for f in feats}
            else:
                chunks = [feats[i:i + batch_size]
                          for i in range(0, len(feats), batch_size)]
                desc = {}
                with ThreadPoolExecutor(max_workers=concurrency) as ex:
                    for part in ex.map(
                            lambda c: _post_batch(endpoint, c,
                                                  timeout_s, retries),
                            chunks):
                        desc.update(part)
            yield pd.DataFrame(
                {"doc_id": [f["doc_id"] for f in feats],
                 "label": [f["label"] for f in feats],
                 "n_px": [f["n_px"] for f in feats],
                 "description": [desc.get(f["doc_id"]) for f in feats]})

    return df.select("doc_id", "media").mapInPandas(fn, DESCRIBE_SCHEMA)


def picture_descriptions_for(df: DataFrame, opt,
                             concurrency: int | None = None) -> DataFrame:
    """Options wiring for the reference's do_picture_description knob:
    route through the configured API endpoint
    (opt.picture_description_api, the reference's
    picture_description_api option); with no endpoint set, the built-in
    deterministic engine runs — it IS this engine's local model (the
    opt.picture_description_local model NAME is recorded in the options
    hash for lineage but selects no alternative implementation; there
    is exactly one local engine).  Raises ValueError if the stage is
    not enabled — callers gate on opt.do_picture_description exactly
    like the reference pipeline."""
    if not opt.do_picture_description:
        raise ValueError("do_picture_description is not enabled")
    return picture_describe(
        df, endpoint=opt.picture_description_api,
        concurrency=concurrency if concurrency is not None else 4)


# ---------------------------------------------------------------------------
# deterministic mock endpoint (TEST DOUBLE — in-process, same formula)
# ---------------------------------------------------------------------------

def start_mock_describer(fail_first: int = 0, delay_s: float = 0.0):
    """Start an in-process HTTP server implementing the describe
    contract with describe_from_features.  ``fail_first`` requests
    return 500 (retry exercise); ``delay_s`` sleeps before responding
    (timeout exercise).  Returns (endpoint_url, server); the server
    runs on a daemon thread and dies with the process."""
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"failures_left": fail_first, "n_requests": 0,
             "in_flight": 0, "max_in_flight": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            with lock:
                state["n_requests"] += 1
                state["in_flight"] += 1
                state["max_in_flight"] = max(state["max_in_flight"],
                                             state["in_flight"])
                fail = state["failures_left"] > 0
                if fail:
                    state["failures_left"] -= 1
            # the slot must be released BEFORE the response leaves:
            # the client frees its concurrency slot the moment it
            # reads the reply, which can beat this handler thread's
            # post-write cleanup — decrementing after the write lets
            # a replacement request overlap the stale count and
            # overstate max_in_flight by 1.
            released = False

            def release():
                with lock:
                    state["in_flight"] -= 1

            try:
                if delay_s:
                    time.sleep(delay_s)
                n = int(self.headers.get("Content-Length", 0))
                feats = json.loads(self.rfile.read(n))
                if fail:
                    released = True
                    release()
                    self.send_response(500)
                    self.end_headers()
                    return
                out = [{"doc_id": f["doc_id"],
                        "description": describe_from_features(
                            f["label"], f["n_px"])}
                       for f in feats]
                body = json.dumps(out).encode()
                released = True
                release()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            finally:
                if not released:
                    release()

        def log_message(self, *a):       # silence request logging
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    srv.mock_state = state
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return (f"http://127.0.0.1:{srv.server_address[1]}/describe", srv)
