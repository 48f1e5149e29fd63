"""Citation verification: the answer's article refs split into
supported-by-hits vs unsupported (hallucinated)."""

from legalrag_tpu.pipeline.citations import (extract_article_refs,
                                             verify_citations)
from legalrag_tpu.schemas import LawChunk, RetrievalHit


def _hit(article_id, lang="zh", article_no=None, rank=1):
    return RetrievalHit(
        chunk=LawChunk(id=f"{lang}-{article_id}", law_name="法",
                       article_no=article_no or f"第{article_id}条",
                       article_id=str(article_id), text="...", lang=lang),
        score=0.9, rank=rank)


def test_extract_zh_numeral_refs():
    text = "依据第一千零七十九条和第5条，可以解除。又见第一千零七十九条。"
    assert extract_article_refs(text) == ["1079", "5"]


def test_extract_en_section_refs():
    text = "Under § 2-201 and Section 9-109(a), see also Article 2."
    refs = extract_article_refs(text)
    assert "2-201" in refs and "9-109" in refs


def test_verify_supported_and_unsupported():
    hits = [_hit("1079", rank=1), _hit("5", rank=2)]
    out = verify_citations("根据第一千零七十九条与第5条；另见第99条。", hits)
    assert [c["ref"] for c in out["supported"]] == ["1079", "5"]
    assert out["supported"][0]["rank"] == 1
    assert out["unsupported"] == ["99"]


def test_verify_en_hits():
    hits = [_hit("2-201", lang="en", article_no="§ 2-201")]
    out = verify_citations("The statute of frauds in § 2-201 controls; "
                           "§ 9-610 does not apply.", hits)
    assert [c["ref"] for c in out["supported"]] == ["2-201"]
    assert out["unsupported"] == ["9-610"]


def test_no_refs_yields_empty_lists():
    out = verify_citations("本案应当综合判断。", [_hit("1")])
    assert out == {"supported": [], "unsupported": []}


def test_en_article_level_and_dash_refs():
    hits = [_hit("2-201", lang="en", article_no="§ 2-201")]
    # en-dash section ref + article-level ref supported via prefix
    out = verify_citations("Under § 2–201 and Article 2; but Article 9 "
                           "does not apply.", hits)
    assert [c["ref"] for c in out["supported"]] == ["2-201", "Article 2"]
    assert out["unsupported"] == ["Article 9"]
