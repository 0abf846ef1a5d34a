"""CLI front door: the reference's TWO user interfaces re-expressed over
the Spark engine — closing the "interactive CLI" fidelity gap (r11
verdict, What's missing #4).

Mirrors (behavior, not code):
- ``pulsar_backup_restore.py:384-405`` — the interactive 5-option menu
  (1 capture / 2 restore / 3 replay / 4 delete-all / 5 print-all);
- ``pulsar_remote_inspector.py:674-696`` — argparse subcommands
  (``all``/``tenants``/``namespaces``/``topics``/``publish``/``sample``)
  including the campaign-knob validation rules (``--campaign-start``
  requires ``--campaign-count`` and vice versa; ``--campaign-ids`` is
  mutually exclusive with the range form).

Live-broker actions are env-gated on ``PULSAR_ADMIN_URL`` /
``PULSAR_SERVICE_URL`` (this container ships no broker); everything that
can run offline does — DDL plans from a capture dir, replay frames,
message printing, sample generation. The heavy lifting stays in the
package; this module is a thin, testable dispatch layer
(``run_menu``/``build_parser``/``run_command`` are imported by tests with
injected input/echo — no subprocess, no real stdin).

Usage:
  python tools/cli.py                    # interactive menu
  python tools/cli.py sample
  python tools/cli.py tenants|namespaces|topics [--tenant T] [--namespace N]
  python tools/cli.py publish --topic T --count N --rate R [knobs]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MENU = """Choose an option:
1. Capture Pulsar tenants, namespaces, topics, and messages
2. Restore Pulsar tenants, namespaces, and topics
3. Replay captured messages
4. Delete ALL Pulsar resources (topics, namespaces, tenants)
5. Print all messages in all topics"""


def _spark():
    from pulsar_replay_spark.session import get_spark

    spark = get_spark("pulsar-replay-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _admin_url() -> "str | None":
    return os.environ.get("PULSAR_ADMIN_URL")


def _service_url() -> "str | None":
    return os.environ.get("PULSAR_SERVICE_URL")


def topics_frame_from_capture(spark, backup_dir: str):
    """(topic, tenant, namespace) catalog recovered from a capture dir —
    the input both DDL plans take."""
    from pyspark.sql import functions as F

    from pulsar_replay_spark.sources.jsonio import read_json_capture

    return (
        read_json_capture(spark, backup_dir)
        .select("topic")
        .distinct()
        .select(
            "topic",
            F.regexp_extract("topic", r"://([^/]+)/", 1).alias("tenant"),
            F.regexp_extract("topic", r"://[^/]+/([^/]+)/", 1).alias(
                "namespace"
            ),
        )
    )


def menu_capture(spark, out_dir: str, max_per_topic: int = 10_000, echo=print) -> None:
    """Option 1: walk the live catalog, bounded-scan every topic, write the
    reference's one-JSON-file-per-topic backup. Live-broker only."""
    admin, service = _admin_url(), _service_url()
    if not admin or not service:
        echo(
            "capture needs a live broker: set PULSAR_ADMIN_URL and "
            "PULSAR_SERVICE_URL (none in this environment)"
        )
        return
    from pulsar_replay_spark.sources.jsonio import write_json_capture
    from pulsar_replay_spark.sources.pulsar_connector import (
        admin_list_namespaces,
        admin_list_topics,
        read_topics,
    )

    ns = admin_list_namespaces(spark, admin)
    topics = []
    for r in ns.collect():
        tenant, namespace = r["namespace"].split("/", 1)
        topics += [
            t["topic"] for t in admin_list_topics(spark, admin, tenant, namespace).collect()
        ]
    env = read_topics(spark, service, admin, topics=topics, max_per_topic=max_per_topic)
    write_json_capture(env, out_dir)
    echo(f"captured {len(topics)} topics into {out_dir}")


def menu_restore(spark, backup_dir: str, echo=print) -> None:
    """Option 2: ordered DDL plan from the capture (offline); executed
    against the Admin REST endpoint when one is configured."""
    from pulsar_replay_spark.catalog_ddl import execute_plan, restore_plan

    plan = restore_plan(topics_frame_from_capture(spark, backup_dir))
    rows = plan.collect()
    for r in rows:
        echo(f"step {r['step']}: {r['op']} {r['target']}")
    admin = _admin_url()
    if admin:
        n = execute_plan(plan, admin)
        echo(f"executed {n} DDL operations against {admin}")
    else:
        echo(
            f"plan only ({len(rows)} operations) — set PULSAR_ADMIN_URL to "
            "execute"
        )


def menu_replay(spark, backup_dir: str, echo=print) -> None:
    """Option 3: rebuild the replay frame (properties/eventTime/key
    preserved) from the capture; live send is env-gated."""
    from pyspark.sql import functions as F

    from pulsar_replay_spark.sources.jsonio import read_json_capture, replay_frame
    from pulsar_replay_spark.sources.pulsar_connector import write_replay

    env = read_json_capture(spark, backup_dir)
    frame = replay_frame(env)
    per_topic = frame.groupBy("topic").agg(F.count("*").alias("n")).collect()
    for r in sorted(per_topic, key=lambda x: x["topic"]):
        echo(f"{r['topic']}: {r['n']} messages ready to replay")
    admin, service = _admin_url(), _service_url()
    if admin and service:
        write_replay(env, service, admin)
        echo("replay published")
    else:
        echo(
            "replay frame built — set PULSAR_SERVICE_URL and "
            "PULSAR_ADMIN_URL to publish"
        )


def menu_delete(spark, backup_dir: str, confirm: str, echo=print) -> None:
    """Option 4: guarded drop plan (system tenants excluded). The typed
    'DELETE' confirmation is the reference's interactive guard; execution
    additionally needs a live Admin endpoint."""
    from pulsar_replay_spark.catalog_ddl import deletion_plan, execute_plan

    plan = deletion_plan(topics_frame_from_capture(spark, backup_dir))
    rows = plan.collect()
    for r in rows:
        echo(f"step {r['step']}: {r['op']} {r['target']}")
    if confirm != "DELETE":
        echo("aborted: deletion requires typing DELETE exactly")
        return
    admin = _admin_url()
    if admin:
        n = execute_plan(plan, admin, confirm=confirm)
        echo(f"executed {n} delete operations against {admin}")
    else:
        echo(
            f"plan only ({len(rows)} operations) — set PULSAR_ADMIN_URL to "
            "execute"
        )


def menu_print_all(spark, backup_dir: str, echo=print) -> None:
    """Option 5: print every captured message per topic (the reference's
    reader loop over a capture instead of a live sub — fully offline)."""
    from pulsar_replay_spark.sources.jsonio import read_json_capture

    env = read_json_capture(spark, backup_dir)
    rows = env.collect()
    by_topic: dict = {}
    for r in rows:
        by_topic.setdefault(r["topic"], []).append(r)
    for topic in sorted(by_topic):
        echo(f"\nTopic: {topic}")
        for i, r in enumerate(by_topic[topic], 1):
            echo(f"Message {i}: {r['content']}")
            if r["properties"]:
                echo(f"Properties: {dict(r['properties'])}")
            if r["partition_key"]:
                echo(f"Partition key: {r['partition_key']}")
        echo(f"\nTotal messages read from {topic}: {len(by_topic[topic])}")
    echo("\nPrinting completed.")


def run_menu(spark, input_fn=input, echo=print) -> None:
    """The reference's interactive loop: print the menu, read one choice,
    dispatch. Prompts for the backup directory where the option needs one."""
    echo(MENU)
    choice = input_fn("Enter choice (1/2/3/4/5): ").strip()
    if choice == "1":
        menu_capture(spark, input_fn("Backup directory to write: ").strip(), echo=echo)
    elif choice == "2":
        menu_restore(spark, input_fn("Backup directory to restore from: ").strip(), echo=echo)
    elif choice == "3":
        menu_replay(spark, input_fn("Backup directory to replay from: ").strip(), echo=echo)
    elif choice == "4":
        backup = input_fn("Backup directory holding the catalog: ").strip()
        confirm = input_fn("Type DELETE to confirm: ").strip()
        menu_delete(spark, backup, confirm, echo=echo)
    elif choice == "5":
        menu_print_all(spark, input_fn("Backup directory to print: ").strip(), echo=echo)
    else:
        echo("Invalid choice. Exiting.")


def build_parser():
    """The inspector's subcommand surface, knob names included."""
    import argparse

    p = argparse.ArgumentParser(prog="cli.py", description=__doc__)
    sub = p.add_subparsers(dest="command")
    for name in ("all", "tenants"):
        sub.add_parser(name)
    ns = sub.add_parser("namespaces")
    ns.add_argument("--tenant")
    tp = sub.add_parser("topics")
    tp.add_argument("--tenant")
    tp.add_argument("--namespace")
    tp.add_argument("--topics-limit", type=int, default=None)
    pub = sub.add_parser("publish")
    pub.add_argument("--topic", required=True)
    pub.add_argument("--count", type=int, default=10)
    pub.add_argument("--rate", type=int, default=100)
    pub.add_argument("--project-id", type=int, default=None)
    pub.add_argument("--campaign-ids", type=int, nargs="+", default=None)
    pub.add_argument("--campaign-start", type=int, default=None)
    pub.add_argument("--campaign-count", type=int, default=None)
    pub.add_argument("--no-auto-detect", action="store_true")
    sub.add_parser("sample")
    return p


def validate_publish_args(parser, args) -> None:
    """The reference's campaign-knob rules, verbatim semantics."""
    if args.campaign_start is not None and args.campaign_count is None:
        parser.error("--campaign-start requires --campaign-count")
    if args.campaign_count is not None and args.campaign_start is None:
        parser.error("--campaign-count requires --campaign-start")
    if args.campaign_ids and (
        args.campaign_start is not None or args.campaign_count is not None
    ):
        parser.error(
            "Cannot use both --campaign-ids and --campaign-start/--campaign-count"
        )


def run_command(spark, args, parser=None, echo=print) -> None:
    from pulsar_replay_spark.sources.pulsar_connector import (
        admin_list_namespaces,
        admin_list_tenants,
        admin_list_topics,
    )

    admin = _admin_url()
    if args.command == "sample":
        from pulsar_replay_spark.generator import generate_emailsend

        row = generate_emailsend(spark, 1).select("json").head()
        echo(json.dumps(json.loads(row["json"]), indent=2))
        return
    if args.command == "publish":
        if parser is not None:
            validate_publish_args(parser, args)
        service = _service_url()
        if not service:
            echo(
                "publish needs a live broker: set PULSAR_SERVICE_URL "
                "(none in this environment)"
            )
            return
        from pyspark.sql import functions as F

        from pulsar_replay_spark.generator import generate_emailsend
        from pulsar_replay_spark.sources.pulsar_connector import (
            write_replay_paced,
        )

        msgs = generate_emailsend(
            spark,
            args.count,
            topic=args.topic,
            project_id=args.project_id,
            campaign_ids=args.campaign_ids,
            campaign_start=args.campaign_start,
            campaign_count=args.campaign_count,
            auto_detect_project=not args.no_auto_detect,
        )
        env = msgs.select(
            "topic",
            F.col("json").alias("content"),
            F.lit(False).alias("binary_encoded"),
            F.create_map().cast("map<string,string>").alias("properties"),
            F.current_timestamp().alias("publish_timestamp"),
            F.lit(None).cast("timestamp").alias("event_timestamp"),
            F.lit(None).cast("string").alias("partition_key"),
        )
        topic = args.topic

        def producer_factory():
            import pulsar  # only present next to a live broker

            return pulsar.Client(service).create_producer(topic)

        write_replay_paced(env, producer_factory, rate_per_second=args.rate)
        echo(f"published {args.count} messages to {args.topic}")
        return
    # catalog walks need the Admin endpoint
    if not admin:
        echo(
            "catalog commands need a live broker: set PULSAR_ADMIN_URL "
            "(none in this environment)"
        )
        return
    if args.command in (None, "all"):
        for r in admin_list_tenants(spark, admin).collect():
            echo(f"tenant: {r['tenant']}")
        for r in admin_list_namespaces(spark, admin).collect():
            echo(f"namespace: {r['namespace']}")
    elif args.command == "tenants":
        for r in admin_list_tenants(spark, admin).collect():
            echo(r["tenant"])
    elif args.command == "namespaces":
        for r in admin_list_namespaces(spark, admin, tenant=args.tenant).collect():
            echo(r["namespace"])
    elif args.command == "topics":
        if args.tenant and args.namespace:
            rows = admin_list_topics(spark, admin, args.tenant, args.namespace).collect()
        else:
            # the inspector's tenant walk: namespaces first, topics per each
            rows = []
            for ns_row in admin_list_namespaces(
                spark, admin, tenant=args.tenant
            ).collect():
                tenant, namespace = ns_row["namespace"].split("/", 1)
                rows += admin_list_topics(spark, admin, tenant, namespace).collect()
        if args.topics_limit:
            rows = rows[: args.topics_limit]
        for r in rows:
            echo(r["topic"])


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    spark = _spark()
    if not argv:
        run_menu(spark)
        return
    parser = build_parser()
    args = parser.parse_args(argv)
    run_command(spark, args, parser=parser)


if __name__ == "__main__":
    main()
