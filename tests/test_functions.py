"""Exact-value unit tests for F1–F8 and M7–M13, ported in spirit from the
reference's tests (reference: tests/test_metrics_calculator.py,
tests/test_event_processor.py — see FIXTURES.md §5)."""

import numpy as np

from nostr_data_pipeline_ray.functions import scoring, textfns


# ---- scalars (test_metrics_calculator.py analogs) --------------------------

def test_zap_stats_exact_values():
    s = scoring.zap_stats([100, 500, 1000, 2000, 5000])
    assert s["total"] == 8600
    assert s["mean"] == 1720
    assert s["median"] == 1000
    assert s["min"] == 100
    assert s["max"] == 5000
    assert s["count"] == 5


def test_zap_stats_empty():
    assert scoring.zap_stats([])["total"] == 0


def test_virality_monotone_in_age():
    young = scoring.virality_score(10, 5000, 3, 2, 8, age_hours=1.0)
    old = scoring.virality_score(10, 5000, 3, 2, 8, age_hours=24.0)
    assert young > old > 0


def test_virality_vector_matches_scalar():
    got = scoring.virality_score_v([10, 0], [5000, 0], [3, 0], [2, 0], [8, 0], [1.0, 0.0])
    assert got[0] == scoring.virality_score(10, 5000, 3, 2, 8, 1.0)
    assert got[1] == scoring.virality_score(0, 0, 0, 0, 0, 0.0)


def test_trend_score_monotone_in_authors():
    few = scoring.trend_score(100, 20, 50, 24)
    many = scoring.trend_score(100, 50, 50, 24)
    assert many > few
    assert scoring.trend_score_v([100], [20], [50], [24])[0] == few


def test_spam_rules():
    assert scoring.is_spam_likely(15, 8, 0, 0, False) is True
    assert scoring.is_spam_likely(200, 2, 1, 1, False) is False
    assert scoring.is_spam_likely(500, 11, 0, 0, False) is True  # >10 hashtags
    v = scoring.is_spam_likely_v([15, 200], [8, 2], [0, 1], [0, 1], [False, False])
    assert list(v) == [True, False]


def test_quality_score_bounds_and_order():
    high = scoring.content_quality_score(300, True, 2, 5, 3)
    low = scoring.content_quality_score(10, False, 0, 0, 0)
    for s in (high, low):
        assert 0 <= s <= 100
    assert high > low
    v = scoring.content_quality_score_v([300, 10], [True, False], [2, 0], [5, 0], [3, 0])
    assert v[0] == high and v[1] == low


def test_relay_health_and_influence_and_growth():
    assert scoring.relay_health_score(100, 0, 1e9, 0) == 100.0
    assert scoring.relay_health_score(0, 10000, 0, 1) == 0.0
    assert scoring.user_influence_score(0, 0, 0.0, 0, 0) == 0.0
    g = scoring.network_growth_rate(10, 1000, 5)
    assert g == {"daily_growth_rate": 1.0, "day_over_day_change": 100.0}
    assert scoring.engagement_rate(100, 1000, 10) == 1.0
    assert scoring.engagement_rate(100, 0, 10) == 0.0


# ---- extractors (test_event_processor.py analogs) ---------------------------

def test_extract_hashtags_content_and_tags():
    got = textfns.extract_hashtags(
        "This is a #test with #multiple #hashtags", ["Extra"]
    )
    assert set(got) == {"test", "multiple", "hashtags", "extra"}


def test_parse_bolt11_amount():
    assert textfns.parse_bolt11_amount("lnbc1000m1pjluenc...") == 100_000_000
    assert textfns.parse_bolt11_amount("lnbc500u1xyz") == 50_000
    assert textfns.parse_bolt11_amount("notaninvoice") is None
    assert textfns.parse_bolt11_amount(None) is None
    assert textfns.parse_bolt11_amount("lnbc") is None


def test_media_urls():
    urls = [
        "https://example.com/image.jpg",
        "https://example.com/page.html",
        "https://example.com/video.mp4",
    ]
    got = textfns.media_urls(urls)
    assert got == ["https://example.com/image.jpg", "https://example.com/video.mp4"]
    assert textfns.has_media(urls) is True
    assert textfns.has_media(["https://example.com/page.html"]) is False


def test_extract_reply_to_marker_wins():
    tags = [
        ["e", "event_id_1", "relay", "root"],
        ["e", "event_id_2", "relay", "reply"],
        ["e", "event_id_3"],
    ]
    assert textfns.extract_reply_to(tags) == "event_id_2"
    # without a reply marker, the LAST e-tag wins
    assert textfns.extract_reply_to([["e", "a"], ["e", "b"], ["p", "x"]]) == "b"
    assert textfns.extract_reply_to([["p", "x"]]) is None


def test_extract_urls_and_mentions():
    assert textfns.extract_urls("go to https://x.co/a and http://y.io") == [
        "https://x.co/a",
        "http://y.io",
    ]
    assert textfns.extract_mentions([["p", "pk1"], ["e", "ev"], ["p", "pk2"]]) == ["pk1", "pk2"]


def test_detect_language():
    assert textfns.detect_language("hello world") == "en"
    assert textfns.detect_language("你好世界") == "zh"
    assert textfns.detect_language("こんにちは") == "ja"
    assert textfns.detect_language("안녕하세요") == "ko"
    assert textfns.detect_language("") is None


def test_is_like():
    assert textfns.is_like("+") is True
    assert textfns.is_like("\U0001F44D") is True
    assert textfns.is_like("meh") is False


# ---- batch stages over a real pandas batch ---------------------------------

def test_text_enricher_batch():
    import pandas as pd

    from nostr_data_pipeline_ray.stages.text import TextAnalyzer, TextEnricher

    df = pd.DataFrame(
        {
            "text": [
                "Check #Nostr and #bitcoin https://example.com/image.jpg",
                "short",
                "你好 world",
                "",
            ]
        }
    )
    out = TextEnricher()(df.copy())
    assert out.loc[0, "hashtags"] == ["bitcoin", "nostr"]
    assert bool(out.loc[0, "has_media"]) is True
    assert out.loc[1, "hashtag_count"] == 0
    assert list(out["n_chars"]) == [len(t) for t in df["text"]]

    out2 = TextAnalyzer()(df.copy())
    assert out2.loc[0, "lang_detected"] == "en"
    assert out2.loc[2, "lang_detected"] == "zh"
    assert pd.isna(out2.loc[3, "lang_detected"])
    assert out2.loc[1, "token_count"] == 1
    assert out2.loc[0, "word_count"] >= 5
    # fingerprint is deterministic and normalization-insensitive
    a = TextAnalyzer()(pd.DataFrame({"text": ["Hello   World"]}))["fingerprint"][0]
    b = TextAnalyzer()(pd.DataFrame({"text": ["hello world"]}))["fingerprint"][0]
    assert a == b
