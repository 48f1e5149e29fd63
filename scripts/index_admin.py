"""CLI: list / activate index versions (parity: reference
``scripts/index_admin.py:22-34``)."""

from __future__ import annotations

import argparse
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index import IndexRegistry


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=("list", "active", "activate"))
    ap.add_argument("version", nargs="?")
    ap.add_argument("--lang", default="zh")
    args = ap.parse_args()

    cfg = AppConfig.load()
    reg = IndexRegistry(Path(cfg.paths.index_dir) / args.lang)
    if args.command == "list":
        for v in reg.list_versions():
            marker = "*" if v == reg.active_version() else " "
            print(f"{marker} {v}")
    elif args.command == "active":
        print(reg.active_version() or "(unversioned root)")
        print(reg.active_index_dir())
    else:
        if not args.version:
            raise SystemExit("activate requires a version")
        print(reg.activate(args.version))


if __name__ == "__main__":
    main()
