"""Fixed-decimal rounding — THE engine-wide float contract for
oracle-compared scores (DuckDB ROUND semantics: half away from zero).

One implementation, imported by dedup, textops and analytics: the
pipelines are required to round identically on both sides of the oracle
compare, so the convention must not be able to silently diverge between
three private copies (it had — the old ``np.floor(x*s + 0.5)`` form
rounds a NEGATIVE half-tie toward zero, while DuckDB rounds it away;
lm-scores are always negative).
"""

from __future__ import annotations

import numpy as np


def round_away(x, decimals: int = 2) -> np.ndarray:
    """Half-away-from-zero at ``decimals`` places, matching DuckDB ROUND
    for negative inputs too. Bit-identical to ``floor(x*s + 0.5)/s`` for
    non-negative inputs (the historical form), so positive-valued oracle
    contracts are unchanged."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def round6(x) -> np.ndarray:
    """The 6-decimal score contract used by every dedup/similarity
    pipeline."""
    return round_away(x, 6)
