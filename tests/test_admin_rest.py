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


# ---------------------------------------------------------------------------
# S1/S2 live tenant + namespace listing (reference :341-356, :358-392)
# ---------------------------------------------------------------------------

TENANTS = ["eventbus", "public", "empty-tenant"]
NAMESPACES = {
    "eventbus": ["eventbus/org-1", "eventbus/org-2"],
    "public": ["public/default"],
    # empty-tenant 404s — the reference silently skips it in the walk
}


class _CatalogHandler(BaseHTTPRequestHandler):
    seen_auth: list[str | None] = []

    def do_GET(self):
        _CatalogHandler.seen_auth.append(self.headers.get("Authorization"))
        if self.path.endswith("/admin/v2/tenants"):
            body = TENANTS
        elif "/admin/v2/namespaces/" in self.path:
            tenant = self.path.rsplit("/", 1)[1]
            if tenant not in NAMESPACES:
                self.send_response(404)
                self.end_headers()
                return
            body = NAMESPACES[tenant]
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
def catalog_stub():
    srv = HTTPServer(("127.0.0.1", 0), _CatalogHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_admin_list_tenants(spark, catalog_stub):
    from pulsar_replay_spark.sources.pulsar_connector import admin_list_tenants

    _CatalogHandler.seen_auth.clear()
    df = admin_list_tenants(spark, catalog_stub, token="tok123")
    assert sorted(r["tenant"] for r in df.collect()) == sorted(TENANTS)
    assert df.columns == ["tenant"]
    assert all(a == "Bearer tok123" for a in _CatalogHandler.seen_auth)


def test_admin_list_namespaces_single_tenant(spark, catalog_stub):
    from pulsar_replay_spark.sources.pulsar_connector import admin_list_namespaces

    _CatalogHandler.seen_auth.clear()
    df = admin_list_namespaces(spark, catalog_stub, tenant="eventbus")
    assert sorted(r["namespace"] for r in df.collect()) == NAMESPACES["eventbus"]
    assert all(a is None for a in _CatalogHandler.seen_auth)  # tokenless mode


def test_admin_list_namespaces_walks_all_tenants_skipping_404s(spark, catalog_stub):
    from pulsar_replay_spark.sources.pulsar_connector import admin_list_namespaces

    df = admin_list_namespaces(spark, catalog_stub)
    got = sorted(r["namespace"] for r in df.collect())
    # empty-tenant 404s and is skipped, like the reference's walk
    assert got == sorted(NAMESPACES["eventbus"] + NAMESPACES["public"])


def test_admin_list_namespaces_unknown_tenant_raises(spark, catalog_stub):
    from pulsar_replay_spark.sources.pulsar_connector import admin_list_namespaces

    # a DIRECT listing of a missing tenant is an error (only the all-tenant
    # walk treats 404 as empty)
    with pytest.raises(PulsarUnavailable):
        admin_list_namespaces(spark, catalog_stub, tenant="nope")


def test_admin_catalog_unreachable_raises_clean(spark):
    from pulsar_replay_spark.sources.pulsar_connector import (
        admin_list_namespaces,
        admin_list_tenants,
    )

    with pytest.raises(PulsarUnavailable):
        admin_list_tenants(spark, "http://127.0.0.1:9")
    with pytest.raises(PulsarUnavailable):
        admin_list_namespaces(spark, "http://127.0.0.1:9")
