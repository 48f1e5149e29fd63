"""Generation-quality eval (evals/generation.py): citation P/R,
faithfulness proxy, schema validity, and the extractive answerer whose
citations verify end-to-end. Beyond-reference — the reference's eval
stops at retrieval (reference scripts/evaluate_retrieval.py)."""

from legalrag_tpu.evals.generation import (aggregate_generation,
                                           evaluate_answer,
                                           extractive_answer, faithfulness,
                                           schema_validity,
                                           sentence_supported,
                                           split_sentences)
from legalrag_tpu.schemas import LawChunk, RetrievalHit

ZH_TEXT = "夫妻一方要求离婚的，可以由有关组织进行调解或者直接向人民法院提起离婚诉讼。"
EN_TEXT = ("A contract for the sale of goods for the price of $500 or more "
           "is not enforceable unless there is some writing sufficient to "
           "indicate that a contract for sale has been made.")


def _hit(article_id, lang="zh", text=None, rank=1):
    return RetrievalHit(
        chunk=LawChunk(id=f"{lang}-{article_id}", law_name="民法典",
                       article_no=(f"第{article_id}条" if lang == "zh"
                                   else f"§ {article_id}"),
                       article_id=str(article_id),
                       text=text or (ZH_TEXT if lang == "zh" else EN_TEXT),
                       lang=lang),
        score=0.9, rank=rank)


# ---------------------------------------------------------------- units

def test_split_sentences_zh_en():
    assert split_sentences("结论成立。依据充分；理由如下！", "zh") == [
        "结论成立", "依据充分", "理由如下"]
    sents = split_sentences("It holds. Because of § 2-201; see below.", "en")
    assert sents[0] == "It holds"
    assert len(sents) == 3


def test_sentence_supported_containment():
    # sentence drawn from the provision → supported
    assert sentence_supported("夫妻一方要求离婚的可以提起离婚诉讼", [ZH_TEXT], "zh")
    # unrelated sentence → unsupported
    assert not sentence_supported("本案适用惩罚性赔偿的相关规定", [ZH_TEXT], "zh")
    assert sentence_supported(
        "the contract for sale of goods is not enforceable without a "
        "writing", [EN_TEXT], "en")
    assert not sentence_supported(
        "punitive damages are recoverable against the manufacturer",
        [EN_TEXT], "en")


def test_faithfulness_rates():
    hits = [_hit("1079")]
    ans = "夫妻一方要求离婚的，可以向人民法院提起离婚诉讼。本案还应适用惩罚性赔偿与精神损害抚慰金。"
    out = faithfulness(ans, hits, "zh")
    assert out["total_sentences"] == 2
    assert out["supported_sentences"] == 1
    assert abs(out["support_rate"] - 0.5) < 1e-9
    assert faithfulness("", hits, "zh")["support_rate"] == 0.0


def test_schema_validity():
    assert schema_validity('{"conclusion": "yes", "article": "1079"}',
                           ("conclusion", "article"))
    assert not schema_validity('{"conclusion": "yes"}',
                               ("conclusion", "article"))
    assert not schema_validity("not json at all", ())
    assert not schema_validity('["a", "b"]', ())


# ------------------------------------------- extractive answerer e2e

def test_extractive_answer_citations_verify_zh():
    hits = [_hit("1079", rank=1), _hit("1080", rank=2)]
    ans = extractive_answer("如何离婚？", hits, "zh")
    out = evaluate_answer("如何离婚？", ans, hits, gold_id="1079", lang="zh")
    assert out["cites_anything"]
    assert out["citation_precision"] == 1.0
    assert out["citation_recall"] == 1.0
    assert out["support_rate"] > 0.5  # quoted provisions support themselves


def test_extractive_answer_citations_verify_en():
    hits = [_hit("2-201", lang="en", rank=1)]
    ans = extractive_answer("Is an oral contract enforceable?", hits, "en")
    out = evaluate_answer("Is an oral contract enforceable?", ans, hits,
                          gold_id="2-201", lang="en")
    assert out["citation_precision"] == 1.0
    assert out["citation_recall"] == 1.0


def test_extractive_answer_empty_hits():
    assert "未检索到" in extractive_answer("q", [], "zh")
    assert "no relevant" in extractive_answer("q", [], "en")


def test_degraded_answer_is_the_floor():
    from legalrag_tpu.llm.client import DEGRADED_ANSWER
    hits = [_hit("1079")]
    out = evaluate_answer("q", DEGRADED_ANSWER["zh"], hits, gold_id="1079",
                          lang="zh")
    assert not out["cites_anything"]
    assert out["citation_precision"] is None
    assert out["citation_recall"] == 0.0


def test_hallucinated_citation_hurts_precision():
    hits = [_hit("1079")]
    ans = "结论：依据第1079条与第99条，可以离婚。"
    out = evaluate_answer("q", ans, hits, gold_id="1079", lang="zh")
    assert out["n_refs"] == 2
    assert abs(out["citation_precision"] - 0.5) < 1e-9
    assert out["citation_recall"] == 1.0


def test_judge_hook():
    hits = [_hit("1079")]
    seen = {}

    def judge(q, a, provisions):
        seen["args"] = (q, a, provisions)
        return 0.75

    out = evaluate_answer("q", "第1079条适用。", hits, gold_id=None,
                          lang="zh", judge=judge)
    assert out["judge_score"] == 0.75
    assert seen["args"][2] == [ZH_TEXT]
    assert "citation_recall" not in out  # gold_id None skips recall


# ------------------------------------------------------------ aggregate

def test_aggregate_none_aware():
    items = [
        {"citation_precision": 1.0, "citation_recall": 1.0,
         "cites_anything": True, "n_refs": 2},
        {"citation_precision": None, "citation_recall": 0.0,
         "cites_anything": False, "n_refs": 0},
    ]
    agg = aggregate_generation(items)
    assert agg["n"] == 2
    assert agg["citation_precision"] == 1.0  # None excluded from the mean
    assert agg["citation_recall"] == 0.5
    assert agg["cites_anything"] == 0.5
    assert agg["n_refs"] == 1.0
    assert aggregate_generation([]) == {"n": 0}
