"""Text enrichment / analysis stages (M1–M13 analogs + training-data ops).

Both stages are callable CLASSES: regexes/stopword sets are built once per
worker in ``__init__`` (the reference's singleton-per-process pattern,
src/nostr_pipeline/config.py:78), work is vectorized pandas/numpy per
batch. Run them either as an actor pool (``map_batches(Cls, concurrency=N)``
— heavy/exclusive state) or, for this cheap state, task-based via
``stages.actors.per_worker(Cls)`` (same setup-once semantics, no pool
spin-up — measured 4× faster on short pipelines).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.scoring import content_quality_score_v, is_spam_likely_v


class TextEnricher:
    """Transcript/document enrichment — the kind-1 text-note analog.

    Adds: n_chars, hashtags (list), hashtag_count, url_count, has_media,
    is_spam, quality_score. Reference semantics: _process_text_note
    (src/nostr_pipeline/transformers/event_processor.py:90-120) with
    engagement inputs zeroed (no zaps on transcript text).
    """

    def __init__(self):
        self.hashtag_re = re.compile(r"#(\w+)")
        self.url_re = re.compile(r"https?://[^\s]+")
        self.media_re = re.compile(
            r"https?://[^\s?#]+\.(?:jpg|jpeg|png|gif|webp|mp4|mov|webm)(?:[?#][^\s]*)?",
            re.IGNORECASE,
        )
        self.mention_re = re.compile(r"@(\w+)")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        batch["n_chars"] = text.str.len().astype("int64")
        hashtags = text.str.findall(self.hashtag_re).map(
            lambda hs: sorted({h.lower() for h in hs})
        )
        batch["hashtags"] = hashtags
        batch["hashtag_count"] = hashtags.str.len().astype("int64")
        batch["url_count"] = text.str.count(self.url_re).astype("int64")
        batch["mention_count"] = text.str.count(self.mention_re).astype("int64")
        batch["has_media"] = text.str.contains(self.media_re).astype(bool)
        batch["is_spam"] = is_spam_likely_v(
            batch["n_chars"],
            batch["hashtag_count"],
            batch["url_count"],
            batch["mention_count"],
            np.zeros(len(batch), dtype=bool),
        )
        batch["quality_score"] = content_quality_score_v(
            batch["n_chars"],
            batch["has_media"],
            batch["hashtag_count"],
            np.zeros(len(batch)),
            np.zeros(len(batch)),
        )
        return batch


_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on as at by".split()
)


class TextAnalyzer:
    """Language-ID, token counting, quality signals, fingerprint.

    Training-data-pipeline ops over a ``text`` column:
      lang        char-range heuristic (zh/ja/ko/en — reference semantics,
                  event_processor.py:299-315; null for empty text)
      token_count BPE-ish regex tokens (\\w+ | single non-space punct)
      word_count  whitespace tokens
      stop_ratio  stopword fraction of word tokens
      punct_ratio punctuation chars / chars
      fingerprint 64-bit stable hash of the whitespace-normalized text
                  (pandas' siphash — the same process-stable hash used by
                  the bucketed shuffle and the MinHash stages; one
                  vectorized call instead of a per-row per-byte loop)
    """

    def __init__(self):
        self.token_re = re.compile(r"\w+|[^\w\s]")
        self.word_re = re.compile(r"\w+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.zh_re = re.compile("[一-鿿]")
        self.ja_re = re.compile("[぀-ゟ゠-ヿ]")
        self.ko_re = re.compile("[가-힯]")
        self.ws_re = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        lang = np.where(
            text.str.contains(self.zh_re),
            "zh",
            np.where(
                text.str.contains(self.ja_re),
                "ja",
                np.where(text.str.contains(self.ko_re), "ko", "en"),
            ),
        )
        batch["lang_detected"] = pd.Series(lang, index=batch.index).where(text.str.len() > 0)
        batch["token_count"] = text.str.count(self.token_re).astype("int64")
        words = text.str.findall(self.word_re)
        n_words = words.str.len()
        batch["word_count"] = n_words.astype("int64")
        batch["stop_ratio"] = (
            words.map(lambda ws: sum(1 for w in ws if w.lower() in _STOPWORDS))
            / n_words.clip(lower=1)
        ).astype("float64")
        batch["punct_ratio"] = (
            text.str.count(self.punct_re) / text.str.len().clip(lower=1)
        ).astype("float64")
        normalized = text.str.lower().str.replace(self.ws_re, " ", regex=True).str.strip()
        batch["fingerprint"] = pd.util.hash_array(normalized.to_numpy(dtype=object))
        return batch
