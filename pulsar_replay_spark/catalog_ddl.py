"""Catalog DDL (SURVEY §2.1 S10/S11): restore and guarded delete.

The reference recreates tenants/namespaces/topics via ``pulsarctl … create``
(``pulsar_backup_restore.py:150-181``) and deletes all non-system resources
behind an interactive confirmation (``:224-293``). Driver-side operations by
nature (catalog mutations, not DataFrames); here:

- the *plan* (what to create / what to delete, system resources excluded) is
  computed as a DataFrame — testable without a broker and parallel at scale;
- the *execution* goes through the public Pulsar Admin REST v2 API and is
  gated: a live broker is optional, and deletion requires the same explicit
  "DELETE" confirmation string the reference demands (``:236``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_replay_spark.catalog import SYSTEM_TENANTS
from pulsar_replay_spark.sources.pulsar_connector import PulsarUnavailable


def restore_plan(topics: DataFrame) -> DataFrame:
    """Ordered DDL plan to recreate a captured catalog: tenants first, then
    namespaces, then topics (the reference's loop order, ``:150-181``)."""
    tenants = topics.select("tenant").distinct().select(
        F.lit(1).alias("step"), F.lit("create-tenant").alias("op"), F.col("tenant").alias("target")
    )
    namespaces = topics.select("tenant", "namespace").distinct().select(
        F.lit(2).alias("step"),
        F.lit("create-namespace").alias("op"),
        F.concat_ws("/", "tenant", "namespace").alias("target"),
    )
    tops = topics.select(
        F.lit(3).alias("step"), F.lit("create-topic").alias("op"), F.col("topic").alias("target")
    )
    return tenants.unionByName(namespaces).unionByName(tops).orderBy("step", "target")


def deletion_plan(topics: DataFrame) -> DataFrame:
    """Guarded-drop plan: every non-system topic, then namespace, then tenant
    (reverse dependency order, ``:224-293``; system exclusion from
    ``config.json:11-14``)."""
    safe = topics.filter(~F.col("tenant").isin(SYSTEM_TENANTS))
    tops = safe.select(
        F.lit(1).alias("step"), F.lit("delete-topic").alias("op"), F.col("topic").alias("target")
    )
    namespaces = safe.select("tenant", "namespace").distinct().select(
        F.lit(2).alias("step"),
        F.lit("delete-namespace").alias("op"),
        F.concat_ws("/", "tenant", "namespace").alias("target"),
    )
    tenants = safe.select("tenant").distinct().select(
        F.lit(3).alias("step"), F.lit("delete-tenant").alias("op"), F.col("tenant").alias("target")
    )
    return tops.unionByName(namespaces).unionByName(tenants).orderBy("step", "target")


def execute_plan(
    plan: DataFrame,
    admin_url: str,
    token: str | None = None,
    confirm: str | None = None,
) -> int:
    """Run a DDL plan against a live Admin REST endpoint. Deletion plans
    require ``confirm="DELETE"`` (the reference's interactive guard).
    Returns the number of operations executed."""
    ops = plan.collect()
    if any(r["op"].startswith("delete") for r in ops) and confirm != "DELETE":
        raise PermissionError('deletion requires confirm="DELETE" (reference guard)')
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise PulsarUnavailable("requests not installed") from e

    headers = {"Authorization": f"Bearer {token}"} if token else {}
    n = 0
    for r in ops:
        op, target = r["op"], r["target"]
        if op == "create-tenant":
            method, path = "PUT", f"/admin/v2/tenants/{target}"
        elif op == "create-namespace":
            method, path = "PUT", f"/admin/v2/namespaces/{target}"
        elif op == "create-topic":
            method, path = "PUT", f"/admin/v2/persistent/{_strip(target)}"
        elif op == "delete-topic":
            method, path = "DELETE", f"/admin/v2/persistent/{_strip(target)}"
        elif op == "delete-namespace":
            method, path = "DELETE", f"/admin/v2/namespaces/{target}"
        elif op == "delete-tenant":
            method, path = "DELETE", f"/admin/v2/tenants/{target}"
        else:  # pragma: no cover
            raise ValueError(op)
        try:
            resp = requests.request(method, admin_url + path, headers=headers, timeout=3)
            resp.raise_for_status()
        except Exception as e:
            raise PulsarUnavailable(f"{op} {target}: {e}") from e
        n += 1
    return n


def _strip(topic: str) -> str:
    return topic.removeprefix("persistent://")
