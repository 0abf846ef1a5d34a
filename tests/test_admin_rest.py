"""S2 Admin REST catalog scan exercised against a local HTTP stub serving
the Pulsar Admin v2 API shape (reference pulsar_remote_inspector.py:394-458)
— the union of base + partitioned listings, bearer-auth header, partition
collapse, and the failure mode — all without a broker."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pulsar_replay_spark.sources.pulsar_connector import PulsarUnavailable, admin_list_topics

BASE = [
    "persistent://eventbus/org-1/ingestion-1",
    "persistent://eventbus/org-1/ingestion-2-partition-0",
    "persistent://eventbus/org-1/ingestion-2-partition-1",
]
PARTITIONED = ["persistent://eventbus/org-1/ingestion-2"]


class _Handler(BaseHTTPRequestHandler):
    seen_auth: list[str | None] = []

    def do_GET(self):
        _Handler.seen_auth.append(self.headers.get("Authorization"))
        if self.path.endswith("/partitioned"):
            body = PARTITIONED
        elif "/persistent/" in self.path:
            body = BASE
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def admin_stub():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_admin_listing_unions_and_collapses(spark, admin_stub):
    _Handler.seen_auth.clear()
    df = admin_list_topics(spark, admin_stub, "eventbus", "org-1", token="tok123")
    topics = sorted(r["topic"] for r in df.collect())
    # partition children collapse into the parent; base ∪ partitioned dedupes
    assert topics == [
        "persistent://eventbus/org-1/ingestion-1",
        "persistent://eventbus/org-1/ingestion-2",
    ]
    assert all(a == "Bearer tok123" for a in _Handler.seen_auth)
    assert len(_Handler.seen_auth) == 2  # base + partitioned endpoints


def test_admin_listing_no_token_sends_no_auth_header(spark, admin_stub):
    _Handler.seen_auth.clear()
    admin_list_topics(spark, admin_stub, "eventbus", "org-1").collect()
    assert all(a is None for a in _Handler.seen_auth)


def test_admin_listing_unreachable_raises_clean(spark):
    with pytest.raises(PulsarUnavailable):
        admin_list_topics(spark, "http://127.0.0.1:9", "t", "ns")
