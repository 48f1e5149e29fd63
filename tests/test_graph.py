"""Law-graph builder + store: relations, budgets, walk semantics."""

import pytest

from legalrag_tpu.graph import GraphBuilder, LawGraphStore
from legalrag_tpu.schemas import LawChunk


def _chunk(aid, text, lang="zh", ano=None):
    return LawChunk(id=f"{lang}:t:{aid}", law_name="测试法" if lang == "zh" else "Test",
                    article_no=ano or (f"第{aid}条" if lang == "zh" else f"§ {aid}"),
                    article_id=str(aid), text=text, lang=lang)


@pytest.fixture
def zh_nodes():
    chunks = [
        _chunk(1, "第一条　本法所称动产抵押，是指以动产设定的抵押。"),
        _chunk(2, "第二条　依照第一条的规定，动产抵押应当登记。"),
        _chunk(3, "第三条　第一条至第二条的规定适用于本章。"),
        _chunk(4, "第四条　其他规定。"),
    ]
    return {n["article_id"]: n for n in GraphBuilder().build_nodes(chunks)}


def test_prev_next(zh_nodes):
    rels = {(nb["article_id"], nb["relation"]) for nb in zh_nodes["2"]["neighbors"]}
    assert ("1", "prev") in rels and ("3", "next") in rels


def test_zh_citation_and_range(zh_nodes):
    edges2 = {(nb["article_id"], nb["relation"]): nb["conf"]
              for nb in zh_nodes["2"]["neighbors"]}
    assert edges2.get(("1", "cite")) == 0.90
    edges1 = {(nb["article_id"], nb["relation"]): nb["conf"]
              for nb in zh_nodes["1"]["neighbors"]}
    assert edges1.get(("2", "cited")) == 0.90
    # range 第一条至第二条 from article 3, conf 0.95
    edges3 = {(nb["article_id"], nb["relation"]): nb["conf"]
              for nb in zh_nodes["3"]["neighbors"]}
    assert edges3.get(("1", "cite")) == 0.95
    assert edges3.get(("2", "cite")) == 0.95


def test_zh_definition_edges(zh_nodes):
    assert "动产抵押" in zh_nodes["1"]["meta"]["defines_terms"]
    edges2 = {(nb["article_id"], nb["relation"]) for nb in zh_nodes["2"]["neighbors"]}
    assert ("1", "defined_by") in edges2
    edges1 = {(nb["article_id"], nb["relation"]) for nb in zh_nodes["1"]["neighbors"]}
    assert ("2", "defines_term") in edges1


def test_en_citation_and_definition():
    chunks = [
        _chunk("1-101", '§ 1-101. "Security interest" means an interest in personal property.', "en"),
        _chunk("1-102", "§ 1-102. As provided in Section 1-101, a security interest attaches.", "en"),
    ]
    nodes = {n["article_id"]: n for n in GraphBuilder().build_nodes(chunks)}
    edges = {(nb["article_id"], nb["relation"]): nb["conf"]
             for nb in nodes["1-102"]["neighbors"]}
    assert edges.get(("1-101", "cite")) == 0.85
    assert ("1-101", "defined_by") in edges
    assert "Security interest" in nodes["1-101"]["meta"]["defines_terms"]


def test_store_walk_depth_caps(tmp_path):
    chunks = [_chunk(i, f"第{i}条　内容。") for i in range(1, 6)]
    path = tmp_path / "g.jsonl"
    GraphBuilder().build_to_file(chunks, path)
    store = LawGraphStore(path)
    # prev/next depth cap 1: only direct neighbors
    nodes = store.walk(["3"], limit=100,
                       relation_max_depth={"prev": 1, "next": 1, "default": 1})
    ids = {n.article_id for n in nodes}
    assert ids == {"2", "4"}
    assert all(n.graph_depth == 1 for n in nodes)
    # depth 2 reaches two hops
    nodes2 = store.walk(["3"], limit=100,
                        relation_max_depth={"prev": 2, "next": 2, "default": 2})
    assert {n.article_id for n in nodes2} == {"1", "2", "4", "5"}


def test_store_walk_limit_and_conf(tmp_path):
    chunks = [_chunk(i, f"第{i}条　内容。") for i in range(1, 6)]
    path = tmp_path / "g.jsonl"
    GraphBuilder().build_to_file(chunks, path)
    store = LawGraphStore(path)
    assert len(store.walk(["3"], limit=2)) == 2
    # conf filter: prev/next edges are conf 1.0, pass min_conf .99
    assert store.walk(["3"], limit=10, min_conf=0.99)
    assert store.get_node("3") is not None
    assert store.walk([], limit=10) == []


def test_real_zh_graph(zh_chunks):
    nodes = GraphBuilder().build_nodes(zh_chunks)
    by_id = {n["article_id"]: n for n in nodes}
    assert len(by_id["43"]["neighbors"]) >= 2  # prev/next always exist
    rels = {nb["relation"] for n in nodes for nb in n["neighbors"]}
    assert {"prev", "next", "cite", "cited"} <= rels
    # 所称X，包括 definitions (e.g. 第1045条 所称子女/父母/兄弟姐妹)
    assert any(n["meta"]["defines_terms"] for n in nodes)
    assert "defined_by" in rels
