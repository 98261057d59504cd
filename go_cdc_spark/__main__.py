"""CLI — two subcommands:

``python -m go_cdc_spark sync config.toml [--continuous]``
    the `cmd/cdc/main.go:15-33` analog (load config → boot sources →
    full sync → incremental sync → print summary).

``python -m go_cdc_spark curate recipe.toml``
    run a declarative corpus-curation recipe (see curate.py) and print
    the per-stage manifest.

``python -m go_cdc_spark status config.toml [--json]``
    the monitoring face (the reference's operational console): per
    source, replication lag changelog → table (``Engine.freshness``)
    and capture lag database → changelog (``Engine.capture_lag``),
    against an EXISTING deployment's state — nothing is synced.

A bare config path (no subcommand) is accepted as ``sync`` for
backward compatibility with the round-≤7 invocation.
"""

from __future__ import annotations

import argparse
import json

from .app import run


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="go_cdc_spark")
    sub = ap.add_subparsers(dest="cmd")

    sync = sub.add_parser("sync", help="CDC sync from a config file")
    sync.add_argument("config", help="path to config .toml/.json")
    sync.add_argument(
        "--continuous",
        action="store_true",
        help="tail changelogs until stopped (default: drain and exit)",
    )

    curate = sub.add_parser("curate", help="run a corpus-curation recipe")
    curate.add_argument("recipe", help="path to recipe .toml")

    status = sub.add_parser(
        "status", help="replication + capture lag report (read-only)"
    )
    status.add_argument("config", help="path to config .toml/.json")
    status.add_argument(
        "--json", action="store_true", help="machine-readable output"
    )

    # legacy form: `python -m go_cdc_spark config.toml [--continuous]`
    if argv is None:
        import sys

        argv = sys.argv[1:]
    if argv and argv[0] not in ("sync", "curate", "status", "-h", "--help"):
        argv = ["sync", *argv]

    args = ap.parse_args(argv)
    if args.cmd == "status":
        from .app import Engine
        from .config import load_config
        from .session import get_spark

        engine = Engine(load_config(args.config), spark=get_spark())
        engine.init_sources()
        report = engine.status()
        if args.json:
            print(json.dumps(report, indent=2, default=str))
            return 0
        for name, entry in report.items():
            print(f"source {name} (id {entry['id']})")
            if entry["tables"]:
                print("  replication lag (changelog -> table):")
                for key, r in sorted(entry["tables"].items()):
                    state = "fresh" if r["fresh"] else f"{r['events_behind']} events behind"
                    print(
                        f"    {key:<24} applied={r['applied_pos']} "
                        f"latest={r['latest_pos']}  {state}"
                    )
            if entry["capture"]:
                print("  capture lag (database -> changelog):")
                for key, r in sorted(entry["capture"].items()):
                    approx = " (approximate)" if r["approximate"] else ""
                    print(
                        f"    {key:<24} watermark={r['watermark']} "
                        f"head={r['source_head']}  behind={r['behind']}{approx}"
                    )
            if not entry["tables"] and not entry["capture"]:
                print("  (no materialized tables or captured tables found)")
        return 0
    if args.cmd == "curate":
        from .curate import run_recipe
        from .session import get_spark

        manifest = run_recipe(get_spark(), args.recipe)
        print(json.dumps(manifest, indent=2, default=str))
        return 0
    if args.cmd == "sync":
        summary = run(args.config, continuous=args.continuous)
        print(json.dumps(summary, indent=2, default=str))
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
