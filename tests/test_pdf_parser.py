"""PDF extraction ladder, exercised with injected fake extractor modules
(VERDICT r1 #6): pdfplumber/pdf2image/pytesseract/docling are absent in this
image, so ``sys.modules`` fakes drive every branch of
``ingest/pdf_parser.py`` — layout reconstruction from word boxes, repeated
header/footer removal, page-number stripping, per-empty-page OCR fallback,
the ≥60%-length layout acceptance rule, the docling rung, and trim_law_body.
Reference behaviors: ``/root/reference/legalrag/pdf/parser.py:194-379``.
"""

import sys
import types

import pytest

from legalrag_tpu.ingest.pdf_parser import (
    _layout_text,
    _lines_from_words,
    extract_text,
    trim_law_body,
)


# ------------------------------------------------------------------ fakes
def _words_for_lines(lines):
    """Word boxes laid out one line per y-row, words left-to-right —
    deliberately fed out of order to prove reading-order reconstruction."""
    words = []
    for row, line in enumerate(lines):
        for col, w in enumerate(line.split()):
            words.append({"text": w, "top": row * 10.0, "x0": col * 20.0})
    return list(reversed(words))


class FakePage:
    def __init__(self, lines, page_number, text=None, broken_words=False):
        self._lines = lines
        self._text = "\n".join(lines) if text is None else text
        self.page_number = page_number
        self._broken_words = broken_words

    def extract_text(self):
        return self._text

    def extract_words(self):
        if self._broken_words:
            raise RuntimeError("word extraction blew up")
        return _words_for_lines(self._lines)


class FakePDF:
    def __init__(self, pages):
        self.pages = pages

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture
def fake_pdfplumber(monkeypatch):
    mod = types.ModuleType("pdfplumber")
    mod._pdf = FakePDF([])

    def open_(path):
        return mod._pdf

    mod.open = open_
    monkeypatch.setitem(sys.modules, "pdfplumber", mod)
    return mod


@pytest.fixture
def fake_ocr(monkeypatch):
    p2i = types.ModuleType("pdf2image")
    tess = types.ModuleType("pytesseract")
    calls = {"pages": [], "langs": []}

    def convert_from_path(path, first_page=None, last_page=None):
        calls["pages"].append(first_page)
        return [f"img-p{first_page}"]

    def image_to_string(img, lang=""):
        calls["langs"].append(lang)
        return f"扫描文本 {img}"

    p2i.convert_from_path = convert_from_path
    tess.image_to_string = image_to_string
    monkeypatch.setitem(sys.modules, "pdf2image", p2i)
    monkeypatch.setitem(sys.modules, "pytesseract", tess)
    return calls


BODY1 = ["第一条 为了保护民事主体的合法权益 维护社会秩序",
         "本条说明适用范围与立法目的 内容较长以便通过长度闸门"]
BODY2 = ["第二条 民事主体从事民事活动 应当遵循自愿原则",
         "按照自己的意思设立变更终止民事法律关系 不受非法干预"]
BODY3 = ["第三条 民事主体的人身权利 财产权利受法律保护",
         "任何组织或者个人不得侵犯 本条是权利保护的总则条款"]
HEADER = "中华人民共和国民法典 总则编"


def _page_lines(body, n):
    return [HEADER] + body + [f"- {n} -"]


def test_layout_extraction_drops_headers_and_page_numbers(fake_pdfplumber,
                                                          tmp_path):
    fake_pdfplumber._pdf = FakePDF([
        FakePage(_page_lines(BODY1, 1), 1),
        FakePage(_page_lines(BODY2, 2), 2),
        FakePage(_page_lines(BODY3, 3), 3),
    ])
    pdf = tmp_path / "law.pdf"
    pdf.write_bytes(b"%PDF-fake")
    out = extract_text(pdf)
    assert HEADER not in out                 # repeated header removed
    assert "- 1 -" not in out and "- 2 -" not in out  # page numbers removed
    for line in BODY1 + BODY2 + BODY3:       # all body lines survive
        assert line in out
    # reading order: articles appear in document order
    assert out.index("第一条") < out.index("第二条") < out.index("第三条")


def test_layout_rejected_when_too_short_falls_back_to_raw(fake_pdfplumber,
                                                          tmp_path):
    """Word extraction losing most of the text (<60% of raw) must fall back
    to the raw per-page text."""
    raw_text = "\n".join(_page_lines(BODY1, 1))
    fake_pdfplumber._pdf = FakePDF([
        FakePage(["短"], 1, text=raw_text),   # layout sees 1 tiny line
    ])
    pdf = tmp_path / "law.pdf"
    pdf.write_bytes(b"%PDF-fake")
    out = extract_text(pdf)
    assert out == raw_text


def test_broken_word_extraction_is_tolerated(fake_pdfplumber, tmp_path):
    fake_pdfplumber._pdf = FakePDF([
        FakePage(BODY1, 1, broken_words=True),
    ])
    pdf = tmp_path / "law.pdf"
    pdf.write_bytes(b"%PDF-fake")
    assert "第一条" in extract_text(pdf)      # raw text path


def test_ocr_fallback_runs_only_on_empty_pages(fake_pdfplumber, fake_ocr,
                                               tmp_path):
    fake_pdfplumber._pdf = FakePDF([
        FakePage(BODY1, 1),
        FakePage([], 2, text=""),             # scanned page
        FakePage(BODY3, 3),
    ])
    pdf = tmp_path / "scan.pdf"
    pdf.write_bytes(b"%PDF-fake")
    out = extract_text(pdf, enable_ocr=True)
    assert fake_ocr["pages"] == [2]           # OCR only for the empty page
    assert "chi_sim" in fake_ocr["langs"][0]
    assert "扫描文本 img-p2" in out
    assert "第一条" in out and "第三条" in out


def test_ocr_disabled_skips_empty_pages(fake_pdfplumber, fake_ocr, tmp_path):
    fake_pdfplumber._pdf = FakePDF([FakePage([], 1, text="")])
    pdf = tmp_path / "scan.pdf"
    pdf.write_bytes(b"%PDF-fake")
    assert extract_text(pdf, enable_ocr=False).strip() == ""
    assert fake_ocr["pages"] == []


def test_ocr_failure_returns_empty(fake_pdfplumber, monkeypatch, tmp_path):
    p2i = types.ModuleType("pdf2image")

    def convert_from_path(*a, **kw):
        raise RuntimeError("poppler missing")

    p2i.convert_from_path = convert_from_path
    tess = types.ModuleType("pytesseract")
    tess.image_to_string = lambda *a, **kw: "never"
    monkeypatch.setitem(sys.modules, "pdf2image", p2i)
    monkeypatch.setitem(sys.modules, "pytesseract", tess)
    fake_pdfplumber._pdf = FakePDF([FakePage([], 1, text="")])
    pdf = tmp_path / "scan.pdf"
    pdf.write_bytes(b"%PDF-fake")
    assert extract_text(pdf, enable_ocr=True).strip() == ""


def test_missing_pdfplumber_raises_clear_error(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "pdfplumber", None)  # force ImportError
    pdf = tmp_path / "x.pdf"
    pdf.write_bytes(b"%PDF-fake")
    with pytest.raises(RuntimeError, match="pdfplumber"):
        extract_text(pdf)


def test_docling_rung_preferred_when_enabled(fake_pdfplumber, monkeypatch,
                                             tmp_path):
    doc_mod = types.ModuleType("docling")
    conv_mod = types.ModuleType("docling.document_converter")

    class _Doc:
        def export_to_markdown(self):
            return "# 民法典\n第一条 来自docling"

    class _Result:
        document = _Doc()

    class DocumentConverter:
        def convert(self, path):
            return _Result()

    conv_mod.DocumentConverter = DocumentConverter
    monkeypatch.setitem(sys.modules, "docling", doc_mod)
    monkeypatch.setitem(sys.modules, "docling.document_converter", conv_mod)
    pdf = tmp_path / "x.pdf"
    pdf.write_bytes(b"%PDF-fake")
    out = extract_text(pdf, enable_docling=True)
    assert "来自docling" in out


def test_docling_failure_falls_through_to_pdfplumber(fake_pdfplumber,
                                                     monkeypatch, tmp_path):
    doc_mod = types.ModuleType("docling")
    conv_mod = types.ModuleType("docling.document_converter")

    class DocumentConverter:
        def convert(self, path):
            raise RuntimeError("docling exploded")

    conv_mod.DocumentConverter = DocumentConverter
    monkeypatch.setitem(sys.modules, "docling", doc_mod)
    monkeypatch.setitem(sys.modules, "docling.document_converter", conv_mod)
    fake_pdfplumber._pdf = FakePDF([FakePage(BODY1, 1)])
    pdf = tmp_path / "x.pdf"
    pdf.write_bytes(b"%PDF-fake")
    assert "第一条" in extract_text(pdf, enable_docling=True)


# ---------------------------------------------------------------- unit bits
def test_lines_from_words_reading_order():
    lines = _lines_from_words(_words_for_lines(["甲 乙 丙", "丁 戊"]))
    assert lines == ["甲 乙 丙", "丁 戊"]


def test_layout_text_empty():
    assert _layout_text([[], []]) == ""


def test_trim_law_body_cuts_toc():
    text = ("中华人民共和国民法典\n目 录\n第一编 总则\n第一章 基本规定\n"
            "第一条 立法目的\n第二条 调整范围\n"
            "第一编 总则\n第一章 基本规定\n"
            "第一条 为了保护民事主体的合法权益，制定本法。\n"
            "第二条 民法调整平等主体之间的关系。")
    out = trim_law_body(text)
    assert out.startswith("第一条")


def test_trim_law_body_nfkc():
    assert trim_law_body("第１２３条　ＡＢＣ") == "第123条 ABC"


def test_ingest_pdf_end_to_end_with_fakes(fake_pdfplumber, tmp_path, zh_text):
    """Full ingest path over a fake PDF containing real statute text must
    take the statute-parse route (quality gate) and produce article chunks."""
    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.ingest.ingestor import PDFIngestor

    lines = [l for l in zh_text.splitlines() if l.strip()][:400]
    pages = [FakePage(lines[i:i + 80], i // 80 + 1)
             for i in range(0, len(lines), 80)]
    fake_pdfplumber._pdf = FakePDF(pages)

    cfg = AppConfig()
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, tmp_path / name)
    cfg.paths.ensure_tree()
    pdf = tmp_path / "minfadian.pdf"
    pdf.write_bytes(b"%PDF-fake")
    ing = PDFIngestor(cfg)
    doc_id, out_path, chunks = ing.ingest_file_to_jsonl(pdf)
    assert doc_id and out_path.exists() and len(chunks) >= 20
    assert any("第" in (c.article_no or "") for c in chunks)
