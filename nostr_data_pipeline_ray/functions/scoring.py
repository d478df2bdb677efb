"""Scoring formulas F1–F8 (SURVEY.md §2.8).

Pure, deterministic scalar functions with the same semantics as the
reference's MetricsCalculator (reference:
src/nostr_pipeline/transformers/metrics_calculator.py:17-350). Each also
ships a vectorized numpy twin (``*_v``) for use inside ``map_batches`` —
the scalar form pins the formula in unit tests, the vector form is the
hot-path implementation. Rounding to 2 decimals is part of the contract
(bit-for-bit oracle equality).
"""

from __future__ import annotations

import math

import numpy as np

# ---- F1: virality (metrics_calculator.py:17-58) ---------------------------

_DECAY = 0.1155  # ln(2)/6 — 6-hour half-life


def virality_score(
    zap_count: int,
    zap_total_sats: int,
    reply_count: int,
    repost_count: int,
    reaction_count: int,
    age_hours: float,
) -> float:
    engagement = (
        3.0 * zap_count
        + 0.001 * zap_total_sats
        + 2.0 * reply_count
        + 2.5 * repost_count
        + 1.0 * reaction_count
    )
    decay = math.exp(-_DECAY * age_hours) if age_hours > 0 else 1.0
    return round(engagement * decay, 2)


def virality_score_v(
    zap_count, zap_total_sats, reply_count, repost_count, reaction_count, age_hours
) -> np.ndarray:
    engagement = (
        3.0 * np.asarray(zap_count, dtype=np.float64)
        + 0.001 * np.asarray(zap_total_sats, dtype=np.float64)
        + 2.0 * np.asarray(reply_count, dtype=np.float64)
        + 2.5 * np.asarray(repost_count, dtype=np.float64)
        + 1.0 * np.asarray(reaction_count, dtype=np.float64)
    )
    age = np.asarray(age_hours, dtype=np.float64)
    decay = np.where(age > 0, np.exp(-_DECAY * age), 1.0)
    return np.round(engagement * decay, 2)


# ---- F2: trend score (metrics_calculator.py:60-92) ------------------------


def trend_score(
    mention_count: int, unique_authors: int, total_zaps: int, window_hours: int
) -> float:
    hours = window_hours if window_hours != 0 else 1
    velocity = mention_count / hours
    return round(velocity * math.log1p(unique_authors) * (1 + math.log1p(total_zaps)), 2)


def trend_score_v(mention_count, unique_authors, total_zaps, window_hours) -> np.ndarray:
    hours = np.asarray(window_hours, dtype=np.float64)
    hours = np.where(hours == 0, 1.0, hours)
    velocity = np.asarray(mention_count, dtype=np.float64) / hours
    diversity = np.log1p(np.asarray(unique_authors, dtype=np.float64))
    zap = np.log1p(np.asarray(total_zaps, dtype=np.float64))
    return np.round(velocity * diversity * (1 + zap), 2)


# ---- F3: user influence (metrics_calculator.py:94-140) --------------------


def user_influence_score(
    follower_count: int,
    total_zaps_received: int,
    avg_zaps_per_note: float,
    total_notes: int,
    account_age_days: int,
) -> float:
    activity_rate = (
        min(total_notes / account_age_days, 10) if account_age_days > 0 else 0
    )
    return round(
        2.0 * math.log1p(follower_count)
        + 1.5 * math.log1p(total_zaps_received)
        + 1.0 * (avg_zaps_per_note * 10)
        + 0.5 * (activity_rate * 2)
        + 0.5 * math.log1p(account_age_days / 30),
        2,
    )


# ---- F4: relay health (metrics_calculator.py:142-179) ---------------------


def relay_health_score(
    uptime_percentage: float,
    avg_latency_ms: float,
    events_per_second: float,
    error_rate: float,
) -> float:
    latency_score = max(0.0, 100.0 - avg_latency_ms / 10.0)
    throughput_score = min(100.0, math.log1p(events_per_second) * 20.0)
    error_score = max(0.0, 100.0 - error_rate * 100.0)
    return round(
        0.4 * uptime_percentage
        + 0.3 * latency_score
        + 0.2 * throughput_score
        + 0.1 * error_score,
        2,
    )


# ---- F5: content quality (metrics_calculator.py:181-226) ------------------


def content_quality_score(
    content_length: int,
    has_media: bool,
    hashtag_count: int,
    zap_count: int,
    reply_count: int,
) -> float:
    if content_length < 50:
        length_score = content_length / 50 * 50
    elif content_length <= 500:
        length_score = 50 + (content_length - 50) / 450 * 50
    else:
        length_score = 100 - min(50, (content_length - 500) / 100)

    media_score = 20 if has_media else 0

    if hashtag_count == 0:
        hashtag_score = 0
    elif hashtag_count <= 3:
        hashtag_score = 15
    elif hashtag_count <= 5:
        hashtag_score = 10
    else:
        hashtag_score = max(0, 10 - (hashtag_count - 5) * 2)

    engagement_score = min(30, zap_count * 5 + reply_count * 2)
    return round(
        0.3 * length_score + 0.2 * media_score + 0.1 * hashtag_score + 0.4 * engagement_score,
        2,
    )


def content_quality_score_v(
    content_length, has_media, hashtag_count, zap_count, reply_count
) -> np.ndarray:
    n = np.asarray(content_length, dtype=np.float64)
    length_score = np.where(
        n < 50,
        n / 50 * 50,
        np.where(n <= 500, 50 + (n - 50) / 450 * 50, 100 - np.minimum(50, (n - 500) / 100)),
    )
    media_score = np.where(np.asarray(has_media, dtype=bool), 20.0, 0.0)
    h = np.asarray(hashtag_count, dtype=np.float64)
    hashtag_score = np.where(
        h == 0,
        0.0,
        np.where(h <= 3, 15.0, np.where(h <= 5, 10.0, np.maximum(0.0, 10 - (h - 5) * 2))),
    )
    engagement = np.minimum(
        30.0,
        np.asarray(zap_count, dtype=np.float64) * 5 + np.asarray(reply_count, dtype=np.float64) * 2,
    )
    return np.round(
        0.3 * length_score + 0.2 * media_score + 0.1 * hashtag_score + 0.4 * engagement, 2
    )


# ---- F6: growth rate (metrics_calculator.py:228-250) ----------------------


def network_growth_rate(
    new_users_today: int, total_users: int, new_users_yesterday: int
) -> dict[str, float]:
    daily = (new_users_today / total_users * 100) if total_users > 0 else 0.0
    dod = (
        (new_users_today - new_users_yesterday) / new_users_yesterday * 100
        if new_users_yesterday > 0
        else 0.0
    )
    return {"daily_growth_rate": round(daily, 2), "day_over_day_change": round(dod, 2)}


# ---- F7 analog + A4: zap stats (metrics_calculator.py:252-287) -------------


def zap_stats(zap_amounts: list[int]) -> dict[str, float]:
    """Sorted-array stats; median/p95 use the reference's index convention
    (median = element at count//2; p95 = element at int(count*0.95))."""
    if not zap_amounts:
        return {"total": 0, "count": 0, "mean": 0, "median": 0, "min": 0, "max": 0, "p95": 0}
    xs = sorted(zap_amounts)
    count = len(xs)
    total = sum(xs)
    p95_index = int(count * 0.95)
    return {
        "total": total,
        "count": count,
        "mean": round(total / count, 2),
        "median": xs[count // 2],
        "min": xs[0],
        "max": xs[-1],
        "p95": xs[p95_index] if p95_index < count else xs[-1],
    }


# ---- F7: spam heuristic (metrics_calculator.py:289-322) --------------------


def is_spam_likely(
    content_length: int,
    hashtag_count: int,
    url_count: int,
    mention_count: int,
    is_reply: bool,
) -> bool:
    if content_length < 20 and hashtag_count > 5:
        return True
    if hashtag_count > 10:
        return True
    if content_length < 100 and url_count > 3:
        return True
    if content_length < 50 and mention_count > 5:
        return True
    if not is_reply and content_length < 30 and mention_count > 3:
        return True
    return False


def is_spam_likely_v(
    content_length, hashtag_count, url_count, mention_count, is_reply
) -> np.ndarray:
    n = np.asarray(content_length)
    h = np.asarray(hashtag_count)
    u = np.asarray(url_count)
    m = np.asarray(mention_count)
    r = np.asarray(is_reply, dtype=bool)
    return (
        ((n < 20) & (h > 5))
        | (h > 10)
        | ((n < 100) & (u > 3))
        | ((n < 50) & (m > 5))
        | (~r & (n < 30) & (m > 3))
    )


# ---- F8: engagement rate (metrics_calculator.py:337-350) -------------------


def engagement_rate(total_engagements: int, follower_count: int, content_count: int) -> float:
    if follower_count == 0 or content_count == 0:
        return 0.0
    return round(total_engagements / content_count / follower_count * 100, 2)
