"""Canonical en section-ref tokens ("2-306" ⇔ "§ 2-306" ⇔ "Section
2-306"): one low-df exact token in BM25 terms and hash features, fixing
the citation-shaped-query route the word regex shreds (EVAL.md round-3
en held split)."""

from legalrag_tpu.tokenize import hash_features, secrefs_en, tokenize


def test_secref_shapes_agree():
    # cued surface forms yield the same canonical token on BOTH sides
    for text in ("see § 2-306 for output terms",
                 "see Section 2-306 for output terms"):
        assert secrefs_en(text) == ["2-306"]
        assert secrefs_en(text, query=True) == ["2-306"]
    # bare all-digit refs: QUERY side emits (a bare citation query must
    # reach the cued doc term), DOC side requires the cue so dates and
    # ranges stay out of the stored term stream (ADVICE r4)
    bare = "under 2-306, requirements contracts"
    assert secrefs_en(bare, query=True) == ["2-306"]
    assert secrefs_en(bare) == []


def test_secref_dates_and_ranges_stay_out_of_docs():
    assert secrefs_en("effective 12-31 of each year") == []
    assert secrefs_en("within 10-15 days of delivery") == []
    # article-letter shapes are unambiguous: always emit
    assert secrefs_en("a lease under 2A-201") == ["2A-201"]


def test_secref_article_letters_and_dashes():
    assert secrefs_en("§ 2A-201 and § 9-102 apply") == ["2A-201", "9-102"]
    assert secrefs_en("lease under 2a-201") == ["2A-201"]  # case-folded
    assert secrefs_en("section 2–306 (en dash)") == ["2-306"]


def test_secref_not_in_plain_prose():
    assert secrefs_en("the buyer paid 500 dollars in 2019") == []
    # phone-number-ish long runs don't match the statute shape
    assert secrefs_en("call 555-01234567") == []


def test_tokenize_en_emits_canonical_token():
    toks = tokenize("A firm offer under Section 2-205 is irrevocable.",
                    "en")
    assert "2-205" in toks          # the exact-match route
    assert "section" in toks        # word tokens unchanged
    assert "205" in toks


def test_hash_features_secref_exact_only():
    feats = hash_features("output under § 2-306", "en")
    assert "2-306" in feats
    feats = hash_features("output under 2-306", "en", query=True)
    assert "2-306" in feats
    # no char-ngram bleed onto neighboring sections
    assert not any("2-30" in f and f != "2-306" for f in feats)


def test_zh_unaffected():
    toks = tokenize("第一千零七十九条 离婚", "zh")
    assert all("-" not in t for t in toks)
