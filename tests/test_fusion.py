"""Fusion semantics: RRF math, min-max, blend methods, breakdown payload."""

import numpy as np
import pytest

from legalrag_tpu.retrieval.fusion import ChannelResult, fuse


@pytest.fixture
def channels():
    return [
        ChannelResult("dense", 0.6, [10, 11, 12], [0.9, 0.8, 0.1]),
        ChannelResult("bm25", 0.4, [11, 13, 10], [12.0, 5.0, 4.0]),
    ]


def test_wrrf_math(channels):
    out = {c.row: c for c in fuse(channels, method="wrrf", rrf_k=60)}
    # row 11: dense rank 2, bm25 rank 1
    assert out[11].score == pytest.approx(0.6 / 62 + 0.4 / 61)
    # row 13: bm25 rank 2 only
    assert out[13].score == pytest.approx(0.4 / 62)


def test_plain_rrf(channels):
    out = {c.row: c for c in fuse(channels, method="rrf", rrf_k=60)}
    assert out[10].score == pytest.approx(1 / 61 + 1 / 63)


def test_weighted_sum_minmax(channels):
    out = {c.row: c for c in fuse(channels, method="weighted_sum")}
    # dense minmax: 0.9→1, 0.8→0.875, 0.1→0; bm25: 12→1, 5→0.125, 4→0
    assert out[10].score == pytest.approx(0.6 * 1.0 + 0.4 * 0.0)
    assert out[11].score == pytest.approx(0.6 * 0.875 + 0.4 * 1.0)


def test_rrf_norm_blend_alpha(channels):
    ws = {c.row: c.score for c in fuse(channels, method="weighted_sum")}
    wr = {c.row: c.score for c in fuse(channels, method="wrrf")}
    lo = min(wr.values())
    hi = max(wr.values())
    blended = {c.row: c.score
               for c in fuse(channels, method="rrf_norm_blend", alpha=0.5)}
    for row in ws:
        rrf_norm = (wr[row] - lo) / (hi - lo)
        assert blended[row] == pytest.approx(0.5 * rrf_norm + 0.5 * ws[row])


def test_breakdown_payload(channels):
    cand = next(c for c in fuse(channels) if c.row == 11)
    bd = cand.breakdown
    assert bd["fusion_method"] == "rrf_norm_blend"
    assert set(bd["per_channel"]) == {"dense", "bm25"}
    assert bd["per_channel"]["bm25"]["rank"] == 1
    assert bd["per_channel"]["dense"]["score"] == 0.8
    assert bd["channels"] == sorted(bd["channels"],
                                    key=lambda n: -bd["channel_contrib"][n])


def test_empty_and_single_channel():
    assert fuse([]) == []
    out = fuse([ChannelResult("dense", 1.0, [5], [2.0])])
    assert len(out) == 1 and out[0].row == 5
