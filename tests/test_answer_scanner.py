"""Incremental structured-answer scanner: sections/items/sentences."""

from legalrag_tpu.api.answer_scanner import StructuredAnswerScanner, sentence_split


PAYLOAD = ('{"sections": ['
           '{"title": "结论", "items": ["可以解除。理由充分。"]},'
           '{"title": "分析", "items": [{"text": "第一点。第二点。"}, "尾项。"]}'
           ']}')


def _feed_all(chunks):
    sc = StructuredAnswerScanner()
    events = []
    for c in chunks:
        events.extend(sc.feed(c))
    return events


def test_whole_payload_at_once():
    events = _feed_all([PAYLOAD])
    kinds = [e for e, _ in events]
    assert kinds.count("section") == 2
    assert kinds.count("item") == 3
    sentences = [p["sentence"] for e, p in events if e == "sentence"]
    assert "可以解除。" in sentences and "第二点。" in sentences


def test_token_by_token_equivalent():
    import json

    def norm(events):
        return {json.dumps([e, p], sort_keys=True, ensure_ascii=False)
                for e, p in events if e != "section"}

    assert norm(_feed_all([PAYLOAD])) == norm(_feed_all(list(PAYLOAD)))


def test_items_emit_before_section_closes():
    sc = StructuredAnswerScanner()
    evs = sc.feed('{"sections": [{"title": "a", "items": ["早发句。",')
    kinds = [e for e, _ in evs]
    assert "item" in kinds and "section" not in kinds


def test_no_sections_no_events():
    sc = StructuredAnswerScanner()
    assert sc.feed("plain prose answer without structure") == []


def test_escaped_quotes_and_braces_in_strings():
    payload = ('{"sections": [{"title": "t", '
               '"items": ["quote \\" and brace { inside. done."]}]}')
    events = _feed_all([payload])
    items = [p for e, p in events if e == "item"]
    assert items and 'brace {' in items[0]["item"]


def test_sentence_split():
    assert sentence_split("甲。乙！丙？") == ["甲。", "乙！", "丙？"]
    assert sentence_split("One. Two! ") == ["One.", "Two!"]
    assert sentence_split("") == []


def test_sse_event_stream_ordering_golden():
    """Golden, JS-free ordering contract for the SSE protocol the UI
    consumes (VERDICT r1 #5): for a fixed payload in fixed 7-char chunks,
    the exact event-kind sequence is stable — structure events fire as soon
    as (and only after) the token completing them, indices are monotonic."""
    from legalrag_tpu.api.answer_scanner import StructuredAnswerScanner

    payload = ('{"sections": [{"title": "结论", "items": ["可以解除。"]}, '
               '{"title": "分析", "items": ["理由一。理由二。"]}]}')
    sc = StructuredAnswerScanner()
    seq, events = [], []
    for i in range(0, len(payload), 7):
        seq.append("token")
        for ev, p in sc.feed(payload[i:i + 7]):
            seq.append(ev)
            events.append((ev, p))

    assert seq == [
        "token", "token", "token", "token", "token", "token", "token",
        "section", "item", "sentence",
        "token", "token", "token", "token", "token", "token",
        "section", "item", "sentence", "sentence",
    ]
    # index monotonicity invariants
    sections = [p["index"] for ev, p in events if ev == "section"]
    assert sections == sorted(sections) == [0, 1]
    for s_idx in (0, 1):
        items = [p["item_index"] for ev, p in events
                 if ev == "item" and p["section_index"] == s_idx]
        assert items == sorted(items)
        for i_idx in set(items):
            js = [p["sentence_index"] for ev, p in events
                  if ev == "sentence" and p["section_index"] == s_idx
                  and p["item_index"] == i_idx]
            assert js == sorted(js) == list(range(len(js)))
    # payload contracts the UI relies on
    assert all(set(p) == {"index", "section"}
               for ev, p in events if ev == "section")
    assert all(set(p) == {"section_index", "item_index", "item"}
               for ev, p in events if ev == "item")
    assert all(set(p) == {"section_index", "item_index", "sentence_index",
                          "sentence"}
               for ev, p in events if ev == "sentence")
