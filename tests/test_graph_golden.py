"""Golden diff: our law graph vs the reference builder's semantics
(VERDICT r2 #9).

``_reference_oracle`` re-encodes the reference ``GraphBuilder``'s exact
behavior (``/root/reference/legalrag/retrieval/builders/graph_builder.py:
201-459``) as a compact clean-room oracle: same sort order, reference
keys, citation regexes/confidences/budgets, 是指-only zh definitions,
case-SENSITIVE pass-2 term containment, and the en quirks that make most
en citation keys unresolvable there (hyphenated section ids only resolve
through the § pattern; ``section_{num}`` range keys never resolve).

Both builders run on the real bundled corpora and the edge sets are
diffed. The assertion: the ONLY divergences are the documented ones —

1. zh 所称X，包括 definitions (the PRC Civil Code never phrases
   definitions with 是指, so the reference extracts zero strong zh terms;
   ``graph/builder.py`` adds the 包括 pattern at conf 0.90);
2. en citation resolution (we resolve hyphenated UCC ids like "2-201"
   through Section/range patterns the reference cannot);
3. en case-insensitive pass-2 term containment;
4. budget displacement: the extra terms/edges above consume per-node
   budgets in a different order, so a reference edge may be crowded out
   (and vice versa) — allowed ONLY at nodes whose budget is full.
"""

import re
from typing import Dict, List, Optional, Tuple

import pytest

from legalrag_tpu.corpus.preprocess import cn_numeral_to_int
from legalrag_tpu.graph.builder import (
    _ZH_DEFINE_INCLUDE,
    _ZH_STOP,
    GraphBuilder,
)
from legalrag_tpu.utils import detect_lang

MAX_CITE, MAX_DEF, MAX_TOTAL = 20, 10, 60

# reference regexes, re-encoded (graph_builder.py:20-27, 78-85)
R_ZH_ART = re.compile(r"第\s*([0-9一二三四五六七八九十百千万两〇零]+)\s*条")
R_ZH_RANGE = re.compile(
    r"第\s*([0-9一二三四五六七八九十百千万两〇零]+)\s*条\s*(?:至|到)\s*"
    r"第\s*([0-9一二三四五六七八九十百千万两〇零]+)\s*条")
R_ZH_DEF_STRONG = re.compile(
    r"(?:本法|本章|本节|本编|本条)?\s*所称\s*([^，。；:：\n]{1,30})\s*"
    r"(?:[，,:：]\s*)?是指")
R_ZH_DEF_WEAK = re.compile(r"([^，。；:：\n]{2,30})\s*是指")
R_EN_RANGE = re.compile(
    r"(Section|Sec\.?|§{1,2}|Article|Art\.?)\s+(\d+)\s*(?:–|-|to|through)"
    r"\s*(\d+)", re.IGNORECASE)
R_EN_SECTION = re.compile(r"(?:Section|Sec\.?)\s+(\d+(?:\.\d+)*)",
                          re.IGNORECASE)
R_EN_ARTICLE = re.compile(r"(?:Article)\s+(\d+)", re.IGNORECASE)
R_EN_PARA = re.compile(r"§\s*(\d+(?:-\d+)*)")
R_EN_DEF_Q1 = re.compile(r"“([^”]{1,60})”\s+(?:means|shall mean)\b",
                         re.IGNORECASE)
R_EN_DEF_Q2 = re.compile(r"\"([^\"]{1,60})\"\s+(?:means|shall mean)\b",
                         re.IGNORECASE)
R_EN_DEF_BARE = re.compile(r"\b([A-Z][A-Za-z0-9\-_ ]{1,40})\s+"
                           r"(?:means|shall mean)\b")
EN_STOP = {"Agreement", "Party", "Parties", "Law", "Regulation", "Court",
           "State", "Company"}


def _zh_num(s: str) -> Optional[int]:
    return cn_numeral_to_int((s or "").replace("〇", "零").strip())


def _safe_add(adj, src, dst, rel, conf, term=None, *, cap):
    if not src or not dst or src == dst:
        return
    lst = adj.setdefault(src, [])
    if len(lst) >= cap:
        return
    for e in lst:
        if e[0] == dst and e[1] == rel:
            if e[2] < conf:
                lst[lst.index(e)] = (dst, rel, conf, term)
            return
    lst.append((dst, rel, conf, term))


def _reference_oracle(chunks):
    """Edges the reference builder would produce: {src: [(dst, rel, conf,
    term)]} plus its term2def registry."""
    def sort_key(c):
        try:
            return (0, int(str(c.article_id)))
        except (TypeError, ValueError):
            return (1, str(c.article_id))

    chunks = sorted(chunks, key=sort_key)
    ref2id: Dict[str, str] = {}
    for c in chunks:
        aid = str(c.article_id or "").strip()
        ref2id[aid] = aid
        try:
            ref2id[f"第{int(aid)}条"] = aid
        except ValueError:
            pass
        ano = re.sub(r"\s+", "", c.article_no or "")
        if ano.startswith("第") and ano.endswith("条"):
            ref2id[ano] = aid
            n = _zh_num(ano[1:-1])
            if n is not None:
                ref2id[f"第{n}条"] = aid
        # en hierarchy keys come from article_no_en, which our LawChunk
        # (like the reference's) does not carry -> none registered

    adj: Dict[str, List[tuple]] = {}
    term2def: Dict[str, str] = {}
    for i, c in enumerate(chunks):
        aid = str(c.article_id or "").strip()
        if i > 0:
            _safe_add(adj, aid, str(chunks[i - 1].article_id), "prev", 1.0,
                      cap=MAX_TOTAL)
        if i + 1 < len(chunks):
            _safe_add(adj, aid, str(chunks[i + 1].article_id), "next", 1.0,
                      cap=MAX_TOTAL)
        text = c.text or ""
        if not text.strip():
            continue
        lang = detect_lang(text)
        if lang == "zh":
            for m in R_ZH_RANGE.finditer(text):
                na, nb = _zh_num(m.group(1)), _zh_num(m.group(2))
                if na is None or nb is None:
                    continue
                lo, hi = min(na, nb), max(na, nb)
                if hi - lo > 200:
                    continue
                for num in range(lo, hi + 1):
                    dst = ref2id.get(f"第{num}条")
                    if dst:
                        _safe_add(adj, aid, dst, "cite", 0.95, cap=MAX_CITE)
                        _safe_add(adj, dst, aid, "cited", 0.95, cap=MAX_CITE)
            for m in R_ZH_ART.finditer(text):
                n = _zh_num(m.group(1))
                dst = ref2id.get(f"第{n}条") if n is not None else None
                if dst:
                    _safe_add(adj, aid, dst, "cite", 0.90, cap=MAX_CITE)
                    _safe_add(adj, dst, aid, "cited", 0.90, cap=MAX_CITE)
        else:
            for m in R_EN_RANGE.finditer(text):
                lo, hi = sorted((int(m.group(2)), int(m.group(3))))
                if hi - lo > 200:
                    continue
                for num in range(lo, hi + 1):
                    dst = ref2id.get(f"section_{num}")  # never registered
                    if dst:  # pragma: no cover - unreachable by design
                        _safe_add(adj, aid, dst, "cite", 0.85, cap=MAX_CITE)
                        _safe_add(adj, dst, aid, "cited", 0.85, cap=MAX_CITE)
            for m in R_EN_SECTION.finditer(text):
                key = m.group(1)
                dst = ref2id.get(key) or ref2id.get(key.split(".")[0])
                if dst:
                    _safe_add(adj, aid, dst, "cite", 0.85, cap=MAX_CITE)
                    _safe_add(adj, dst, aid, "cited", 0.85, cap=MAX_CITE)
            for m in R_EN_ARTICLE.finditer(text):
                dst = ref2id.get(m.group(1))
                if dst:
                    _safe_add(adj, aid, dst, "cite", 0.85, cap=MAX_CITE)
                    _safe_add(adj, dst, aid, "cited", 0.85, cap=MAX_CITE)
            for m in R_EN_PARA.finditer(text):
                key = m.group(1)
                dst = ref2id.get(key) or ref2id.get(key.split("-")[0])
                if dst:
                    _safe_add(adj, aid, dst, "cite", 0.85, cap=MAX_CITE)
                    _safe_add(adj, dst, aid, "cited", 0.85, cap=MAX_CITE)

        defs: List[Tuple[str, float]] = []
        if lang == "zh":
            for m in R_ZH_DEF_STRONG.finditer(text):
                t = re.sub(r"\s+", "", (m.group(1) or "").strip())
                if 2 <= len(t) <= 20 and t not in _ZH_STOP:
                    defs.append((t, 0.95))
            for m in R_ZH_DEF_WEAK.finditer(text):
                t = re.sub(r"\s+", "", (m.group(1) or "").strip())
                if 2 <= len(t) <= 12 and t not in _ZH_STOP:
                    defs.append((t, 0.60))
        else:
            for rx, cf, cap_len in ((R_EN_DEF_Q1, 0.95, 50),
                                    (R_EN_DEF_Q2, 0.95, 50),
                                    (R_EN_DEF_BARE, 0.70, 40)):
                for m in rx.finditer(text):
                    t = (m.group(1) or "").strip()
                    if 2 <= len(t) <= cap_len and t not in EN_STOP:
                        defs.append((t, cf))
        if defs:
            best: Dict[str, float] = {}
            for t, cf in defs:
                best[t] = max(best.get(t, 0.0), cf)
            for t, cf in best.items():
                if cf >= 0.8 and t not in term2def:
                    term2def[t] = aid

    if term2def:
        terms = sorted(term2def, key=len, reverse=True)
        for c in chunks:
            aid = str(c.article_id or "").strip()
            text = c.text or ""
            if not text.strip():
                continue
            added = 0
            for term in terms:
                def_id = term2def[term]
                if def_id == aid or term not in text:  # case-SENSITIVE
                    continue
                conf = 0.90 if len(term) >= 4 else 0.85
                _safe_add(adj, aid, def_id, "defined_by", conf, term,
                          cap=MAX_DEF)
                _safe_add(adj, def_id, aid, "defines_term", conf, term,
                          cap=MAX_DEF)
                added += 1
                if added >= MAX_DEF:
                    break
    return adj, term2def


def _ours(chunks):
    nodes = GraphBuilder().build_nodes(chunks)
    adj = {}
    for node in nodes:
        for e in node["neighbors"]:
            adj.setdefault(node["article_id"], []).append(
                (e["article_id"], e["relation"], e["conf"],
                 (e.get("evidence") or {}).get("term")))
    return adj


def _edge_sets(adj):
    return {(s, d, r) for s, edges in adj.items() for d, r, _, _ in edges}


def _diff_report(ref_adj, our_adj, include_terms, lang):
    ref_e, our_e = _edge_sets(ref_adj), _edge_sets(our_adj)
    extra, missing = our_e - ref_e, ref_e - our_e
    unexplained = []
    our_terms = {(s, d, r): t for s, edges in our_adj.items()
                 for d, r, _, t in edges}
    for s, d, r in extra:
        if r in ("defined_by", "defines_term"):
            t = our_terms.get((s, d, r))
            budget_full = sum(
                1 for _, rr, _, _ in ref_adj.get(s, []) if rr == r
            ) >= MAX_DEF or len(ref_adj.get(s, [])) >= MAX_DEF
            if (t in include_terms) or budget_full or lang == "en":
                continue  # documented classes 1, 3, 4
        elif r in ("cite", "cited") and lang == "en":
            continue  # documented class 2
        unexplained.append(("extra", s, d, r))
    for s, d, r in missing:
        if r in ("defined_by", "defines_term"):
            ours_n = sum(1 for _, rr, _, _ in our_adj.get(s, [])
                         if rr == r)
            if ours_n >= MAX_DEF or len(our_adj.get(s, [])) >= MAX_DEF:
                continue  # class 4: crowded out by budget
        unexplained.append(("missing", s, d, r))
    agree = len(ref_e & our_e)
    denom = max(len(ref_e | our_e), 1)
    return agree / denom, extra, missing, unexplained


@pytest.mark.parametrize("lang", ["zh", "en"])
def test_graph_matches_reference_modulo_documented_divergences(
        lang, zh_chunks, en_chunks):
    chunks = zh_chunks if lang == "zh" else en_chunks
    ref_adj, ref_terms = _reference_oracle(chunks)
    our_adj = _ours(chunks)

    include_terms = set()
    if lang == "zh":
        for c in chunks:
            for m in _ZH_DEFINE_INCLUDE.finditer(c.text or ""):
                t = re.sub(r"\s+", "", m.group(1) or "")
                if 2 <= len(t) <= 20 and t not in _ZH_STOP:
                    include_terms.add(t)

    agree, extra, missing, unexplained = _diff_report(
        ref_adj, our_adj, include_terms, lang)
    assert not unexplained, (
        f"{lang}: {len(unexplained)} edges outside the documented "
        f"divergence classes, e.g. {unexplained[:5]}")

    # structural expectations per documented class
    if lang == "zh":
        # the reference extracts ZERO strong zh terms on the Civil Code
        # (是指 never occurs in definition position there)
        assert not ref_terms, f"oracle unexpectedly found {ref_terms}"
        assert include_terms, "包括-pattern terms should exist on the corpus"
        assert any(r == "defined_by" for _, _, r in _edge_sets(our_adj)), \
            "our builder should add defined_by edges the reference cannot"
        # all prev/next/cite/cited agree exactly
        assert agree > 0.5
    else:
        # en: we RESOLVE citations the reference cannot; everything the
        # reference does resolve, we must also have
        ref_cites = {(s, d, r) for s, d, r in _edge_sets(ref_adj)
                     if r in ("cite", "cited")}
        our_cites = {(s, d, r) for s, d, r in _edge_sets(our_adj)
                     if r in ("cite", "cited")}
        assert our_cites >= ref_cites
        assert len(our_cites) > len(ref_cites), \
            "hyphenated UCC section cites should resolve here"

    # prev/next chains must be identical in both
    for rel in ("prev", "next"):
        ref_pn = {(s, d) for s, d, r in _edge_sets(ref_adj) if r == rel}
        our_pn = {(s, d) for s, d, r in _edge_sets(our_adj) if r == rel}
        assert ref_pn == our_pn, f"{rel} chains diverge"
