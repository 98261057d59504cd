"""CLI: ``python -m go_cdc_spark config.toml [--continuous]`` — the
`cmd/cdc/main.go:15-33` analog (load config → boot sources → full sync →
incremental sync → print summary)."""

from __future__ import annotations

import argparse
import json

from .app import run


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="go_cdc_spark")
    ap.add_argument("config", help="path to config .toml/.json")
    ap.add_argument(
        "--continuous",
        action="store_true",
        help="tail changelogs until stopped (default: drain and exit)",
    )
    args = ap.parse_args(argv)
    summary = run(args.config, continuous=args.continuous)
    print(json.dumps(summary, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
