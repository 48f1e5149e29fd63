"""CLI: fetch raw statute corpora (parity: reference ``data/download_data.py``
and ``data/download_ucc.py``).

The repo bundles the raw texts under ``data/raw/`` (zero-egress images build
fully offline); this script re-fetches them when missing and the network
allows: the PRC Civil Code from a configurable mirror and UCC articles from
law.cornell.edu.
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.utils import get_logger

log = get_logger("download_data")

UCC_ARTICLES = ("1", "2", "2A", "3", "4", "4A", "5", "6", "7", "8", "9")
UCC_URL = "https://www.law.cornell.edu/ucc/{art}"
MINFADIAN_URL_ENV = "LEGALRAG_MINFADIAN_URL"


def fetch(url: str, timeout: float = 30.0) -> bytes:
    req = urllib.request.Request(url, headers={"User-Agent": "legalrag-tpu"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    cfg = AppConfig.load()
    raw = Path(cfg.paths.raw_dir)
    present = sorted(p.name for p in raw.rglob("*.txt") if p.stat().st_size)
    if present and not args.force:
        log.info("raw corpus already present (%d files); use --force to "
                 "refetch", len(present))
        return

    import os

    mf_url = os.environ.get(MINFADIAN_URL_ENV)
    if mf_url:
        try:
            (raw / "minfadian.txt").write_bytes(fetch(mf_url))
            log.info("fetched minfadian.txt")
        except Exception as e:
            log.error("minfadian fetch failed: %s", e)
    else:
        log.warning("set %s to fetch the Civil Code text", MINFADIAN_URL_ENV)

    ucc_dir = raw / "ucc"
    ucc_dir.mkdir(parents=True, exist_ok=True)
    for art in UCC_ARTICLES:
        try:
            html = fetch(UCC_URL.format(art=art)).decode("utf-8", "replace")
            # plain-text projection of the article page
            import re

            text = re.sub(r"<[^>]+>", " ", html)
            (ucc_dir / f"ucc_{art}.txt").write_text(text, encoding="utf-8")
            log.info("fetched ucc_%s", art)
        except Exception as e:
            log.error("ucc_%s fetch failed: %s", art, e)


if __name__ == "__main__":
    main()
