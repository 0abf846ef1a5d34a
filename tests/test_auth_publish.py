"""OAuth2 client-credentials + context resolution (HTTP-stubbed, reference
``pulsar_remote_inspector.py:35-84,139-158``) and the paced publish sink gate
(reference :291-328): batch-size rule min(100, rate//10), inter-batch pacing,
async-send-before-flush ordering, flush-on-completion."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pulsar_replay_spark.sources.auth import PulsarContext, resolve_service_url
from pulsar_replay_spark.sources.pulsar_connector import (
    PulsarUnavailable,
    paced_publish,
)


# ---------------------------------------------------------------------------
# Context / URL waterfall
# ---------------------------------------------------------------------------
def test_service_url_waterfall():
    assert (
        resolve_service_url({"broker-service-url": "pulsar://b:6650",
                             "bookie-service-url": "pulsar://k:6650",
                             "admin-service-url": "http://a:8080"})
        == "pulsar://b:6650"
    )
    assert (
        resolve_service_url({"bookie-service-url": "pulsar://k:6650",
                             "admin-service-url": "http://a:8080"})
        == "pulsar://k:6650"
    )
    assert (
        resolve_service_url({"admin-service-url": "https://a:8080"})
        == "pulsar+ssl://a:6651"
    )
    assert resolve_service_url({"admin-service-url": "http://a:8080"}) == "http://a:6650"


def _write_config(tmp_path, issuer=None, key_file=None):
    cfg = {
        "current-context": "prod",
        "contexts": {
            "prod": {
                "admin-service-url": "http://admin:8080",
                "broker-service-url": "pulsar://broker:6650",
            },
            "dev": {"admin-service-url": "http://dev:8080"},
        },
        "auth-info": {
            "prod": (
                {"issuer_endpoint": issuer, "audience": "urn:cluster",
                 "client_id": "fallback-id", "key_file": key_file}
                if issuer
                else {}
            )
        },
    }
    p = tmp_path / "context.yaml"
    import yaml

    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_context_resolution_current_and_named(tmp_path):
    path = _write_config(tmp_path)
    ctx = PulsarContext.from_file(path)
    assert (ctx.name, ctx.admin_url, ctx.service_url) == (
        "prod", "http://admin:8080", "pulsar://broker:6650"
    )
    dev = PulsarContext.from_file(path, context="dev")
    assert dev.service_url == "http://dev:6650"  # admin-derived fallback


def test_missing_context_raises(tmp_path):
    path = _write_config(tmp_path)
    with pytest.raises(PulsarUnavailable):
        PulsarContext.from_file(path, context="nope")


def test_tokenless_when_no_issuer_or_keyfile(tmp_path):
    ctx = PulsarContext.from_file(_write_config(tmp_path))
    assert ctx.token() is None  # no issuer configured
    ctx2 = PulsarContext.from_file(
        _write_config(tmp_path, issuer="http://x", key_file="/nonexistent")
    )
    assert ctx2.token() is None  # issuer set but key file absent


class _TokenHandler(BaseHTTPRequestHandler):
    calls: list[dict] = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        from urllib.parse import parse_qs

        _TokenHandler.calls.append({k: v[0] for k, v in parse_qs(body).items()})
        payload = json.dumps({"access_token": f"tok-{len(_TokenHandler.calls)}"}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def token_stub():
    srv = HTTPServer(("127.0.0.1", 0), _TokenHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _TokenHandler.calls.clear()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_token_fetch_and_reuse(tmp_path, token_stub):
    key = tmp_path / "sa.json"
    key.write_text(json.dumps({"client_id": "svc-id", "client_secret": "s3cret"}))
    ctx = PulsarContext.from_file(
        _write_config(tmp_path, issuer=token_stub, key_file=str(key))
    )
    assert ctx.token() == "tok-1"
    assert ctx.token() == "tok-1"  # cached: no second POST
    assert len(_TokenHandler.calls) == 1
    call = _TokenHandler.calls[0]
    # client-credentials grant with key-file identity winning over auth-info
    assert call["grant_type"] == "client_credentials"
    assert call["client_id"] == "svc-id"
    assert call["client_secret"] == "s3cret"
    assert call["audience"] == "urn:cluster"


# ---------------------------------------------------------------------------
# Paced publish (S7 gate)
# ---------------------------------------------------------------------------
class _FakeProducer:
    def __init__(self):
        self.events: list[tuple] = []

    def send_async(self, payload, callback=None):
        self.events.append(("send", payload))

    def flush(self):
        self.events.append(("flush",))


class _FakeClock:
    """Deterministic clock + sleep recorder: time only advances via sleep."""

    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, dt):
        self.sleeps.append(round(dt, 6))
        self.t += dt


@pytest.mark.parametrize(
    "rate,expected_batch", [(1000, 100), (2000, 100), (500, 50), (50, 5), (5, 1)]
)
def test_batch_size_rule(rate, expected_batch):
    """batch = min(100, rate//10), floored at 1 — the reference's rule."""
    prod, fc = _FakeProducer(), _FakeClock()
    n = paced_publish(
        (f"m{i}" for i in range(expected_batch * 3)), prod, rate,
        clock=fc.clock, sleep=fc.sleep,
    )
    assert n == expected_batch * 3
    # pacing: a full batch costs batch/rate seconds → 3 sleeps of that size
    assert fc.sleeps == [round(expected_batch / rate, 6)] * 3


def test_all_sent_async_then_single_flush():
    prod, fc = _FakeProducer(), _FakeClock()
    n = paced_publish((f"m{i}" for i in range(123)), prod, 1000,
                      clock=fc.clock, sleep=fc.sleep)
    assert n == 123
    kinds = [e[0] for e in prod.events]
    assert kinds.count("flush") == 1 and kinds[-1] == "flush"
    sent = [e[1] for e in prod.events if e[0] == "send"]
    assert sent == [f"m{i}" for i in range(123)]  # order preserved
    # final short batch (23 msgs) must NOT sleep after — flush immediately
    assert len(fc.sleeps) == 1  # only the one full batch of 100 paces


def test_empty_input_still_flushes():
    prod = _FakeProducer()
    assert paced_publish([], prod, 100) == 0
    assert prod.events == [("flush",)]


def test_write_replay_paced_partition_wiring(spark):
    """The foreachPartition seam: per-partition producer lifecycle runs on
    the executor. Executor-side sends can't be observed from the driver in
    local mode (separate Python workers), so the gate here is that the job
    completes with a picklable factory and the payload projection — the
    pacing/flush semantics themselves are pinned above on paced_publish."""
    from pulsar_replay_spark.envelope import with_envelope
    from pulsar_replay_spark.sources.pulsar_connector import write_replay_paced

    class _WorkerProducer:  # function-local → cloudpickled by value
        def send_async(self, payload, callback=None):
            pass

        def flush(self):
            pass

    env = with_envelope(
        spark.createDataFrame(
            [("persistent://t/n/a", bytearray(b"x"), {}, 1, 1, "k")],
            "topic string, raw binary, properties map<string,string>, "
            "publish_timestamp long, event_timestamp long, partition_key string",
        )
    )
    write_replay_paced(env, _WorkerProducer, rate_per_second=100, partitions=2)
