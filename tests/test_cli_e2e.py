"""End-to-end offline pipeline through the real CLIs (subprocess).

Exercises the full artifact lifecycle in an isolated LEGALRAG_ROOT:
raw statute → preprocess → index build → graph build → synthetic eval set →
evaluation table → demo answer. This is the test the reference never had
(its notebooks played this role, SURVEY.md §4).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory, zh_text):
    root = tmp_path_factory.mktemp("cliroot")
    raw = root / "data" / "raw"
    raw.mkdir(parents=True)
    # a trimmed statute: TOC-free slice with ~80 articles
    lines = zh_text.splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("第一条"))
    end = next(i for i, l in enumerate(lines) if l.startswith("第八十一条"))
    (raw / "mini_law.txt").write_text(
        "中华人民共和国民法典\n" + "\n".join(lines[start:end]), encoding="utf-8")
    return root


def run_cli(root, *args, timeout=240):
    env = dict(os.environ)
    env.update({
        "LEGALRAG_ROOT": str(root),
        "LEGALRAG_FORCE_CPU": "1",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    proc = subprocess.run([sys.executable, "-m", *args], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, f"{args}: {proc.stderr[-2000:]}"
    return proc


def test_full_offline_pipeline(cli_root):
    run_cli(cli_root, "scripts.preprocess_law")
    corpus = cli_root / "data" / "processed" / "law_zh.jsonl"
    assert corpus.exists()
    n_articles = len(corpus.read_text(encoding="utf-8").splitlines())
    assert n_articles >= 70

    run_cli(cli_root, "scripts.build_index")
    assert (cli_root / "data" / "index" / "zh" / "manifest.json").exists()

    run_cli(cli_root, "scripts.build_graph")
    graph = cli_root / "data" / "graph" / "law_graph_zh.jsonl"
    assert len(graph.read_text(encoding="utf-8").splitlines()) == n_articles

    run_cli(cli_root, "scripts.generate_synthetic_data", "--n", "25")
    eval_file = cli_root / "data" / "eval" / "law_qa.jsonl"
    assert len(eval_file.read_text(encoding="utf-8").splitlines()) >= 15

    out = run_cli(cli_root, "scripts.evaluate_retrieval",
                  "--systems", "bm25,fused", "--limit", "12").stdout
    assert "bm25" in out and "fused" in out
    # parse the fused row's R@10 from the table
    fused_row = next(l for l in out.splitlines() if l.startswith("fused"))
    r10 = float(fused_row.split()[2])
    assert r10 >= 0.8

    demo = run_cli(cli_root, "scripts.demo", "监护人的职责是什么",
                   "--top-k", "3").stdout
    assert "top 3 provisions" in demo or "provisions" in demo
    assert "监护" in demo


def test_index_versioning_cli(cli_root):
    run_cli(cli_root, "scripts.build_index", "--index-version", "v2",
            "--activate")
    out = run_cli(cli_root, "scripts.index_admin", "list", "--lang", "zh").stdout
    assert "* v2" in out
    active = run_cli(cli_root, "scripts.index_admin", "active",
                     "--lang", "zh").stdout
    assert "v2" in active
