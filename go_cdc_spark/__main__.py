"""CLI — two subcommands:

``python -m go_cdc_spark sync config.toml [--continuous]``
    the `cmd/cdc/main.go:15-33` analog (load config → boot sources →
    full sync → incremental sync → print summary).

``python -m go_cdc_spark curate recipe.toml``
    run a declarative corpus-curation recipe (see curate.py) and print
    the per-stage manifest.

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

    # legacy form: `python -m go_cdc_spark config.toml [--continuous]`
    if argv is None:
        import sys

        argv = sys.argv[1:]
    if argv and argv[0] not in ("sync", "curate", "-h", "--help"):
        argv = ["sync", *argv]

    args = ap.parse_args(argv)
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
