"""OAuth2 client-credentials auth + kubectl-style context resolution.

Mirrors the reference's connection bootstrap (``pulsar_remote_inspector.py``
:35-84 token fetch, :85-90 admin URL lookup, :139-158 broker→bookie→admin
service-URL waterfall) as pure driver-side helpers: a YAML context file names
clusters and their URLs; an ``auth-info`` section per context carries the
OAuth issuer, audience, and a JSON service-account key file holding
``client_id``/``client_secret``. Tokens are fetched once per context object
and reused (the reference caches the token for the process lifetime — no
expiry handling), and every failure mode degrades to ``None`` / raises
``PulsarUnavailable`` so the engine works tokenless against unauthenticated
brokers.

All network I/O goes through ``requests`` so tests drive it against a local
HTTP stub — same pattern as tests/test_admin_rest.py.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pulsar_replay_spark.sources.pulsar_connector import PulsarUnavailable


def _load_yaml(path: str) -> dict:
    import yaml

    try:
        with open(path) as f:
            cfg = yaml.safe_load(f)
    except Exception as e:
        raise PulsarUnavailable(f"failed to load context file {path}: {e}") from e
    if not isinstance(cfg, dict):
        raise PulsarUnavailable(f"context file {path} is not a mapping")
    return cfg


def resolve_service_url(context_info: dict) -> str:
    """Broker → bookie → admin-derived waterfall (reference :139-158).

    The admin-URL fallback rewrites the scheme/port the way the reference
    does: https admin endpoints become pulsar+ssl on 6651, plain http
    endpoints swap 8080 for the binary port 6650.
    """
    broker = context_info.get("broker-service-url")
    if broker:
        return broker
    bookie = context_info.get("bookie-service-url")
    if bookie:
        return bookie
    admin = context_info.get("admin-service-url", "")
    if admin.startswith("https://"):
        return admin.replace("https://", "pulsar+ssl://").replace(":8080", ":6651")
    return admin.replace("8080", "6650")


@dataclass
class PulsarContext:
    """One resolved context from a kubectl-style Pulsar config file."""

    name: str
    admin_url: str
    service_url: str
    auth_info: dict = field(default_factory=dict)
    _token: str | None = field(default=None, repr=False)
    _token_fetched: bool = field(default=False, repr=False)

    @classmethod
    def from_file(cls, path: str, context: str | None = None) -> "PulsarContext":
        cfg = _load_yaml(path)
        name = context or cfg.get("current-context")
        if not name:
            raise PulsarUnavailable("no current context set in config")
        info = cfg.get("contexts", {}).get(name)
        if info is None:
            raise PulsarUnavailable(f"context {name!r} not in config")
        admin = info.get("admin-service-url")
        if not admin:
            raise PulsarUnavailable(f"no admin URL found for context {name!r}")
        return cls(
            name=name,
            admin_url=admin,
            service_url=resolve_service_url(info),
            auth_info=cfg.get("auth-info", {}).get(name, {}) or {},
        )

    def token(self) -> str | None:
        """OAuth2 client-credentials token, fetched once and reused.

        Returns None (tokenless mode) when the context has no issuer
        configured or the key file is absent/unreadable — matching the
        reference's proceed-without-auth behavior; raises only on an HTTP
        failure from a *configured* issuer (silent auth downgrade would be
        a security hazard the reference's print-and-continue hides).
        """
        if self._token_fetched:
            return self._token
        self._token_fetched = True
        self._token = self._fetch_token()
        return self._token

    def _fetch_token(self) -> str | None:
        issuer = self.auth_info.get("issuer_endpoint")
        if not issuer:
            return None
        key_file = self.auth_info.get("key_file")
        if not key_file or not os.path.exists(key_file):
            return None
        try:
            with open(key_file) as f:
                sa = json.loads(f.read().strip())
        except (OSError, ValueError):
            return None
        import requests

        payload = {
            "grant_type": "client_credentials",
            "client_id": sa.get("client_id", self.auth_info.get("client_id")),
            "client_secret": sa.get("client_secret"),
            "audience": self.auth_info.get("audience"),
        }
        try:
            resp = requests.post(f"{issuer.rstrip('/')}/oauth/token", data=payload, timeout=5)
            resp.raise_for_status()
            return resp.json().get("access_token")
        except Exception as e:
            raise PulsarUnavailable(f"token fetch failed: {e}") from e
