"""Preprocessing-layer tests: numeral conversion, parsers, loader round-trip."""

from legalrag_tpu.corpus import (
    cn_numeral_to_int,
    load_chunks_from_dir,
    normalize_article_no,
    parse_auto,
    parse_en_sections,
    parse_zh_lines,
    parse_zh_scan_fallback,
    write_chunks_jsonl,
)


def test_cn_numeral_basic():
    cases = {"一": 1, "十": 10, "十五": 15, "二十": 20, "九十九": 99,
             "一百": 100, "一百零一": 101, "二百六十": 260, "一千": 1000,
             "一千二百六十": 1260, "一万零一": 10001, "两百": 200}
    for s, v in cases.items():
        assert cn_numeral_to_int(s) == v, s
    assert cn_numeral_to_int("123") == 123
    assert cn_numeral_to_int("abc") is None


def test_normalize_article_no():
    assert normalize_article_no("第一千二百六十条", "zh") == "1260"
    assert normalize_article_no("第十五条", "zh") == "15"
    assert normalize_article_no("§ 2-201", "en") == "2-201"
    assert normalize_article_no("§ 2A-103.5", "en") == "2A-103.5"
    assert normalize_article_no("Article 9", "en") == "9"
    assert normalize_article_no("nonsense", "zh") is None


def test_zh_full_corpus(zh_chunks):
    # the PRC Civil Code has exactly 1260 articles
    assert len(zh_chunks) == 1260
    ids = [int(c.article_id) for c in zh_chunks]
    assert ids == list(range(1, 1261))
    first = zh_chunks[0]
    assert first.article_no == "第一条"
    assert "保护民事主体" in first.text
    assert first.chapter and "第一编" in first.chapter
    assert all(c.lang == "zh" for c in zh_chunks)


def test_en_full_corpus(en_chunks):
    assert len(en_chunks) >= 580
    by_id = {c.article_id: c for c in en_chunks}
    assert "1-101" in by_id
    assert "Uniform Commercial Code" in by_id["1-101"].text
    assert "9-709" in by_id
    assert all(c.lang == "en" for c in en_chunks)


def test_zh_scan_fallback_rejects_citations():
    text = "第一条 甲应当依法履行义务。依照本法第二条的规定处理。第二条 乙享有权利。"
    recs = parse_zh_scan_fallback(text, "测试法")
    ids = [r.article_id for r in recs]
    assert ids == ["1", "2"]
    # the citation 本法第二条 must not have split article 1
    assert "依照本法第二条的规定处理" in recs[0].text


def test_parse_auto_lang_detect():
    zh = parse_auto("第一条 测试条文内容甲乙丙。\n第二条 其他内容。", law_name="测试法")
    assert zh and zh[0].lang == "zh"
    en = parse_auto("§ 1-101. Short Title. This act shall be known as the Test Code.")
    assert en and en[0].lang == "en" and en[0].article_id == "1-101"


def test_loader_roundtrip(tmp_path, en_chunks):
    path = tmp_path / "law_en.jsonl"
    n = write_chunks_jsonl(en_chunks[:25], path)
    assert n == 25
    loaded = load_chunks_from_dir(tmp_path)
    assert len(loaded) == 25
    assert loaded[0] == en_chunks[0]
    # dedup across files: same content twice loads once
    write_chunks_jsonl(en_chunks[:10], tmp_path / "dup.jsonl")
    assert len(load_chunks_from_dir(tmp_path)) == 25


def test_en_parser_parts(ucc_texts):
    recs = parse_en_sections(ucc_texts["ucc_1.txt"], source="ucc_1.txt")
    r = next(r for r in recs if r.article_id == "1-201")
    assert r.section and "PART 2" in r.section.upper()
    assert "General Definitions" in r.text


def test_file_lock_mutual_exclusion(tmp_path):
    import threading
    import time

    from legalrag_tpu.utils.filelock import file_lock

    order = []

    def worker(name):
        with file_lock(tmp_path / "x.lock"):
            order.append(f"{name}-in")
            time.sleep(0.05)
            order.append(f"{name}-out")

    threads = [threading.Thread(target=worker, args=(str(i),)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # critical sections never interleave
    for i in range(0, 6, 2):
        assert order[i].endswith("-in") and order[i + 1].endswith("-out")
        assert order[i].split("-")[0] == order[i + 1].split("-")[0]


def test_parser_never_crashes_on_garbage():
    """Property: parse_auto handles arbitrary byte salads without raising."""
    import random

    rng = random.Random(0)
    alphabet = "第条一二三十§ 1-2.PARTSection（）。\n\t abcXYZ民法典"
    for _ in range(200):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 400)))
        records = parse_auto(text, law_name="fuzz")
        for r in records:
            assert r.article_id and r.text
