"""The CLI front door (tools/cli.py) — the reference's interactive
5-option menu (pulsar_backup_restore.py:384-405) and the inspector's
subcommand surface (pulsar_remote_inspector.py:674-696) over the engine.
Everything offline-runnable is tested for real against a capture dir the
engine itself wrote; live-broker actions are asserted to env-gate with a
named message instead of crashing."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import cli  # noqa: E402  (tools/cli.py)


@pytest.fixture()
def capture_dir(spark, tmp_path):
    """A real capture dir, written by the engine's own JSON sink."""
    from pulsar_replay_spark.sources.jsonio import write_json_capture

    env = spark.createDataFrame(
        [
            (
                "persistent://tenant-1/ns-a/orders",
                '{"k": 1}',
                False,
                {"p": "1"},
                1700000000000,
                1700000000500,
                "key-1",
            ),
            (
                "persistent://tenant-1/ns-a/orders",
                '{"k": 2}',
                False,
                {},
                1700000001000,
                0,
                None,
            ),
            (
                "persistent://tenant-2/ns-b/events",
                "aGVsbG8=",
                True,
                {},
                1700000002000,
                0,
                None,
            ),
        ],
        "topic string, content string, binary_encoded boolean, "
        "properties map<string,string>, publish_timestamp long, "
        "event_timestamp long, partition_key string",
    ).selectExpr(
        "topic",
        "content",
        "binary_encoded",
        "properties",
        "timestamp_millis(publish_timestamp) as publish_timestamp",
        "CASE WHEN event_timestamp = 0 THEN NULL "
        "ELSE timestamp_millis(event_timestamp) END as event_timestamp",
        "partition_key",
    )
    out = str(tmp_path / "backup")
    write_json_capture(env, out)
    return out


def _menu(spark, inputs, monkeypatch=None):
    lines = []
    it = iter(inputs)
    cli.run_menu(spark, input_fn=lambda _p: next(it), echo=lines.append)
    return lines


def test_menu_print_all_reads_capture(spark, capture_dir):
    lines = _menu(spark, ["5", capture_dir])
    text = "\n".join(str(x) for x in lines)
    assert "Topic: persistent://tenant-1/ns-a/orders" in text
    assert 'Message 1: {"k": 1}' in text
    assert "Properties: {'p': '1'}" in text
    assert "Partition key: key-1" in text
    assert "Total messages read from persistent://tenant-1/ns-a/orders: 2" in text
    assert "Printing completed." in text


def test_menu_restore_prints_ordered_plan_offline(spark, capture_dir, monkeypatch):
    monkeypatch.delenv("PULSAR_ADMIN_URL", raising=False)
    lines = _menu(spark, ["2", capture_dir])
    steps = [x for x in lines if str(x).startswith("step ")]
    # tenants before namespaces before topics — the reference's loop order
    assert steps[0].startswith("step 1: create-tenant")
    assert "create-namespace tenant-1/ns-a" in "\n".join(steps)
    assert steps[-1].startswith("step 3: create-topic")
    assert any("plan only (6 operations)" in str(x) for x in lines)


def test_menu_delete_guard_and_plan(spark, capture_dir, monkeypatch):
    monkeypatch.delenv("PULSAR_ADMIN_URL", raising=False)
    lines = _menu(spark, ["4", capture_dir, "yes please"])
    assert any("aborted: deletion requires typing DELETE" in str(x) for x in lines)
    lines = _menu(spark, ["4", capture_dir, "DELETE"])
    text = "\n".join(str(x) for x in lines)
    assert "delete-topic" in text and "plan only" in text


def test_menu_replay_offline_counts(spark, capture_dir, monkeypatch):
    monkeypatch.delenv("PULSAR_ADMIN_URL", raising=False)
    monkeypatch.delenv("PULSAR_SERVICE_URL", raising=False)
    lines = _menu(spark, ["3", capture_dir])
    text = "\n".join(str(x) for x in lines)
    assert "persistent://tenant-1/ns-a/orders: 2 messages ready to replay" in text
    assert "set PULSAR_SERVICE_URL" in text


def test_menu_capture_is_env_gated(spark, monkeypatch, tmp_path):
    monkeypatch.delenv("PULSAR_ADMIN_URL", raising=False)
    monkeypatch.delenv("PULSAR_SERVICE_URL", raising=False)
    lines = _menu(spark, ["1", str(tmp_path / "cap")])
    assert any("set PULSAR_ADMIN_URL and PULSAR_SERVICE_URL" in str(x) for x in lines)


def test_menu_invalid_choice(spark):
    lines = _menu(spark, ["9"])
    assert any("Invalid choice" in str(x) for x in lines)


def test_sample_prints_valid_emailsend(spark):
    parser = cli.build_parser()
    args = parser.parse_args(["sample"])
    lines = []
    cli.run_command(spark, args, parser=parser, echo=lines.append)
    doc = json.loads("\n".join(str(x) for x in lines))
    assert doc["payloadType"] == "emailSend"
    assert "eventId" in doc and "payload" in doc
    assert doc["payload"]["docType"] == "emailSend"


def test_publish_campaign_knob_validation(spark, monkeypatch):
    parser = cli.build_parser()
    with pytest.raises(SystemExit):
        cli.validate_publish_args(
            parser,
            parser.parse_args(
                ["publish", "--topic", "t", "--campaign-start", "5"]
            ),
        )
    with pytest.raises(SystemExit):
        cli.validate_publish_args(
            parser,
            parser.parse_args(
                ["publish", "--topic", "t", "--campaign-count", "5"]
            ),
        )
    with pytest.raises(SystemExit):
        cli.validate_publish_args(
            parser,
            parser.parse_args(
                [
                    "publish",
                    "--topic",
                    "t",
                    "--campaign-ids",
                    "1",
                    "2",
                    "--campaign-start",
                    "5",
                    "--campaign-count",
                    "2",
                ]
            ),
        )
    # a valid combination passes validation and env-gates on the broker
    monkeypatch.delenv("PULSAR_SERVICE_URL", raising=False)
    args = parser.parse_args(
        ["publish", "--topic", "persistent://a/b/ingestion-7", "--count", "3"]
    )
    lines = []
    cli.run_command(spark, args, parser=parser, echo=lines.append)
    assert any("set PULSAR_SERVICE_URL" in str(x) for x in lines)


def test_catalog_commands_env_gated(spark, monkeypatch):
    monkeypatch.delenv("PULSAR_ADMIN_URL", raising=False)
    parser = cli.build_parser()
    for argv in (["tenants"], ["namespaces"], ["topics"], ["all"]):
        lines = []
        cli.run_command(spark, parser.parse_args(argv), parser=parser, echo=lines.append)
        assert any("set PULSAR_ADMIN_URL" in str(x) for x in lines), argv
