"""Self-contained HTML dashboard report — the engine's analog of the
reference's Streamlit dashboard (reference: dashboard/Home.py:119-149 and
pages/1_📈_Overview.py … 6_⚡_Zaps.py — network snapshot, trending topics,
top users, activity, growth, relay health), rendered as one static HTML
file with inline SVG charts. No JS frameworks, no external assets: the file
opens anywhere, forever.

Charts follow a fixed visual contract: single-series marks in one blue,
columns/bars ≤24px with a rounded data-end and square baseline, 2px lines,
hairline solid gridlines, values labeled selectively (ends/extremes), text
in ink tokens (never the series color), native <title> hover tooltips and a
<details> table view under every chart, light + dark via
prefers-color-scheme.
"""

from __future__ import annotations

import html
from typing import Sequence

import numpy as np
import pandas as pd

# palette roles (validated default palette; swap here to re-brand)
_CSS = """
:root { color-scheme: light dark; }
body {
  margin: 0; padding: 24px; background: var(--surface-1);
  color: var(--text-primary);
  font: 14px/1.45 system-ui, -apple-system, 'Segoe UI', sans-serif;
  --surface-1: #fcfcfb; --surface-line: #e8e7e3;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #8a887f;
  --series-1: #2a78d6; --series-wash: rgba(42, 120, 214, 0.10);
  --good: #0ca30c; --warning: #fab219; --critical: #d03b3b;
  --meter-track: #cde2fb;
}
@media (prefers-color-scheme: dark) {
  body {
    --surface-1: #1a1a19; --surface-line: #383835;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8a887f;
    --series-1: #3987e5; --series-wash: rgba(57, 135, 229, 0.12);
    --meter-track: #184f95;
  }
}
h1 { font-size: 20px; margin: 0 0 4px; }
h2 { font-size: 15px; font-weight: 600; margin: 28px 0 8px; }
.sub { color: var(--text-secondary); margin: 0 0 20px; }
.tiles { display: flex; flex-wrap: wrap; gap: 12px; }
.tile {
  border: 1px solid var(--surface-line); border-radius: 8px;
  padding: 12px 16px; min-width: 130px;
}
.tile .label { color: var(--text-secondary); font-size: 12px; }
.tile .value { font-size: 26px; font-weight: 600; margin-top: 2px; }
svg text { fill: var(--text-secondary); font-size: 11px; }
svg .val { fill: var(--text-primary); }
svg .grid { stroke: var(--surface-line); stroke-width: 1; }
svg .mark { fill: var(--series-1); }
svg .line { stroke: var(--series-1); stroke-width: 2;
            stroke-linejoin: round; stroke-linecap: round; fill: none; }
svg .wash { fill: var(--series-wash); }
svg .dot  { fill: var(--series-1); stroke: var(--surface-1); stroke-width: 2; }
details { margin: 6px 0 0; }
summary { color: var(--text-muted); font-size: 12px; cursor: pointer; }
table { border-collapse: collapse; margin-top: 6px; }
td, th { border: 1px solid var(--surface-line); padding: 3px 10px;
         font-size: 12px; text-align: left; }
td.num { text-align: right; font-variant-numeric: tabular-nums; }
.meter { background: var(--meter-track); border-radius: 4px;
         height: 8px; width: 120px; display: inline-block; }
.meter > span { background: var(--series-1); border-radius: 4px;
                height: 8px; display: block; }
"""


def _compact(v) -> str:
    """Auto-compact figure: 1,284 / 12.9K / 4.2M."""
    try:
        x = float(v)
    except (TypeError, ValueError):
        return html.escape(str(v))
    if not np.isfinite(x):
        return "—"
    if abs(x) >= 1e6:
        return f"{x / 1e6:.1f}M"
    if abs(x) >= 10_000:
        return f"{x / 1e3:.1f}K"
    if x == int(x):
        return f"{int(x):,}"
    return f"{x:,.2f}"


def _ticks(vmax: float, n: int = 4) -> list[float]:
    """Clean round-number axis ticks; the last tick is the axis max (the
    first clean step ≥ vmax) — charts scale to ticks[-1], never beyond."""
    if vmax <= 0:
        return [0.0, 1.0]
    raw = vmax / n
    mag = 10 ** np.floor(np.log10(raw))
    step = float(min(s * mag for s in (1, 2, 5, 10) if s * mag >= raw))
    ticks = [i * step for i in range(int(np.ceil(vmax / step)) + 1)]
    return ticks


def _rounded_col(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Column path: rounded data-end (top), square baseline."""
    r = min(r, w / 2, h)
    return (
        f"M{x:.1f},{y + h:.1f} v{-(h - r):.1f} q0,{-r} {r},{-r} "
        f"h{w - 2 * r:.1f} q{r},0 {r},{r} v{h - r:.1f} z"
    )


def _rounded_bar(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Horizontal bar path: rounded data-end (right), square baseline."""
    r = min(r, h / 2, w)
    return (
        f"M{x:.1f},{y:.1f} h{w - r:.1f} q{r},0 {r},{r} v{h - 2 * r:.1f} "
        f"q0,{r} {-r},{r} h{-(w - r):.1f} z"
    )


def _table_view(df: pd.DataFrame, cols: Sequence[str]) -> str:
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    rows = []
    for _, r in df.iterrows():
        tds = []
        for c in cols:
            v = r[c]
            if isinstance(v, (int, float, np.integer, np.floating)):
                tds.append(f'<td class="num">{_compact(v)}</td>')
            else:
                tds.append(f"<td>{html.escape(str(v))}</td>")
        rows.append("<tr>" + "".join(tds) + "</tr>")
    return (
        "<details><summary>data table</summary><table>"
        f"<tr>{head}</tr>{''.join(rows)}</table></details>"
    )


def stat_tiles(items: list[tuple[str, object]]) -> str:
    tiles = "".join(
        f'<div class="tile"><div class="label">{html.escape(label)}</div>'
        f'<div class="value">{_compact(value)}</div></div>'
        for label, value in items
    )
    return f'<div class="tiles">{tiles}</div>'


def bar_chart(df: pd.DataFrame, cat: str, val: str, title: str) -> str:
    """Horizontal bars — magnitude per named item, largest first."""
    df = df.sort_values(val, ascending=False).reset_index(drop=True)
    n = len(df)
    left, bw, gap, w = 150, 16, 6, 560
    hgt = n * (bw + gap) + 24
    ticks = _ticks(float(df[val].max()) if n else 1.0)
    vmax = ticks[-1] or 1.0
    span = w - left - 70
    parts = [f'<h2>{html.escape(title)}</h2>',
             f'<svg width="{w}" height="{hgt}" role="img" '
             f'aria-label="{html.escape(title)}">']
    for t in ticks:
        x = left + (t / max(vmax, 1e-9)) * span
        parts.append(f'<line class="grid" x1="{x:.1f}" y1="4" '
                     f'x2="{x:.1f}" y2="{hgt - 20}"/>')
        parts.append(f'<text x="{x:.1f}" y="{hgt - 6}" '
                     f'text-anchor="middle">{_compact(t)}</text>')
    for i, r in df.iterrows():
        y = 4 + i * (bw + gap)
        bl = max((float(r[val]) / max(vmax, 1e-9)) * span, 1.0)
        label = html.escape(str(r[cat]))
        parts.append(f'<text x="{left - 8}" y="{y + bw - 4}" '
                     f'text-anchor="end">{label}</text>')
        parts.append(f'<path class="mark" d="{_rounded_bar(left, y, bl, bw)}">'
                     f'<title>{label}: {_compact(r[val])}</title></path>')
        parts.append(f'<text class="val" x="{left + bl + 6}" y="{y + bw - 4}">'
                     f'{_compact(r[val])}</text>')
    parts.append("</svg>")
    parts.append(_table_view(df, [cat, val]))
    return "".join(parts)


def column_chart(df: pd.DataFrame, cat: str, val: str, title: str) -> str:
    """Columns in natural category order (hours, days)."""
    df = df.reset_index(drop=True)
    n = max(len(df), 1)
    w, hgt, pad_l, pad_b, pad_t = 640, 190, 52, 26, 8
    span_x, span_y = w - pad_l - 8, hgt - pad_t - pad_b
    slot = span_x / n
    bw = min(24.0, slot * 0.7)
    ticks = _ticks(float(df[val].max()) if len(df) else 1.0)
    vmax = ticks[-1] or 1.0
    parts = [f'<h2>{html.escape(title)}</h2>',
             f'<svg width="{w}" height="{hgt}" role="img" '
             f'aria-label="{html.escape(title)}">']
    for t in ticks:
        y = pad_t + span_y - (t / max(vmax, 1e-9)) * span_y
        parts.append(f'<line class="grid" x1="{pad_l}" y1="{y:.1f}" '
                     f'x2="{w - 8}" y2="{y:.1f}"/>')
        parts.append(f'<text x="{pad_l - 6}" y="{y + 4:.1f}" '
                     f'text-anchor="end">{_compact(t)}</text>')
    peak = int(df[val].idxmax()) if len(df) else -1
    for i, r in df.iterrows():
        v = float(r[val])
        ch = (v / max(vmax, 1e-9)) * span_y
        x = pad_l + i * slot + (slot - bw) / 2
        y = pad_t + span_y - ch
        label = html.escape(str(r[cat]))
        parts.append(
            f'<path class="mark" d="{_rounded_col(x, y, bw, max(ch, 1.0))}">'
            f'<title>{label}: {_compact(v)}</title></path>'
        )
        if n <= 31 and (i % max(1, n // 16) == 0):
            parts.append(f'<text x="{x + bw / 2:.1f}" y="{hgt - 8}" '
                         f'text-anchor="middle">{label}</text>')
        if i == peak:  # label the extreme only
            parts.append(f'<text class="val" x="{x + bw / 2:.1f}" '
                         f'y="{y - 4:.1f}" text-anchor="middle">{_compact(v)}</text>')
    parts.append("</svg>")
    parts.append(_table_view(df, [cat, val]))
    return "".join(parts)


def line_chart(df: pd.DataFrame, xcol: str, ycol: str, title: str) -> str:
    """Single-series line with area wash and an end-dot + end label."""
    df = df.reset_index(drop=True)
    n = max(len(df), 2)
    w, hgt, pad_l, pad_b, pad_t = 640, 190, 52, 26, 8
    span_x, span_y = w - pad_l - 60, hgt - pad_t - pad_b
    ticks = _ticks(float(df[ycol].max()) if len(df) else 1.0)
    vmax = ticks[-1] or 1.0
    xs = [pad_l + i * span_x / (n - 1) for i in range(len(df))]
    ys = [pad_t + span_y - (float(v) / max(vmax, 1e-9)) * span_y for v in df[ycol]]
    parts = [f'<h2>{html.escape(title)}</h2>',
             f'<svg width="{w}" height="{hgt}" role="img" '
             f'aria-label="{html.escape(title)}">']
    for t in ticks:
        y = pad_t + span_y - (t / max(vmax, 1e-9)) * span_y
        parts.append(f'<line class="grid" x1="{pad_l}" y1="{y:.1f}" '
                     f'x2="{w - 60}" y2="{y:.1f}"/>')
        parts.append(f'<text x="{pad_l - 6}" y="{y + 4:.1f}" '
                     f'text-anchor="end">{_compact(t)}</text>')
    if len(df) >= 2:
        pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
        base = pad_t + span_y
        parts.append(f'<polygon class="wash" points="{xs[0]:.1f},{base:.1f} '
                     f'{pts} {xs[-1]:.1f},{base:.1f}"/>')
        parts.append(f'<polyline class="line" points="{pts}"/>')
        for x, y, (_, r) in zip(xs, ys, df.iterrows()):
            parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" opacity="0">'
                         f'<title>{html.escape(str(r[xcol]))}: '
                         f'{_compact(r[ycol])}</title></circle>')
        parts.append(f'<circle class="dot" cx="{xs[-1]:.1f}" cy="{ys[-1]:.1f}" r="4"/>')
        parts.append(f'<text class="val" x="{xs[-1] + 8:.1f}" y="{ys[-1] + 4:.1f}">'
                     f'{_compact(df[ycol].iloc[-1])}</text>')
    step = max(1, len(df) // 6)
    for i in range(0, len(df), step):
        parts.append(f'<text x="{xs[i]:.1f}" y="{hgt - 8}" text-anchor="middle">'
                     f'{html.escape(str(df[xcol].iloc[i]))}</text>')
    parts.append("</svg>")
    parts.append(_table_view(df, [xcol, ycol]))
    return "".join(parts)


def health_table(df: pd.DataFrame, title: str) -> str:
    """Partition health — meter fill carries the score; value printed."""
    rows = []
    for _, r in df.iterrows():
        pct = max(0.0, min(100.0, float(r["health"])))
        rows.append(
            f'<tr><td class="num">{int(r["pkey"])}</td>'
            f'<td><span class="meter"><span style="width:{pct:.0f}%"></span>'
            f'</span></td><td class="num">{pct:.1f}</td>'
            f'<td class="num">{_compact(r["events_per_sec"])}</td>'
            f'<td class="num">{_compact(r["rows_in"])}</td></tr>'
        )
    return (
        f"<h2>{html.escape(title)}</h2><table>"
        "<tr><th>partition</th><th>health</th><th>score</th>"
        "<th>events/s</th><th>rows in</th></tr>"
        f"{''.join(rows)}</table>"
    )


def render_html(sf_dir: str, queries: dict) -> str:
    """Compose the dashboard from the registered queries (the same
    aggregates the reference's six Streamlit pages chart)."""

    def df(name: str) -> pd.DataFrame:
        r = queries[name](sf_dir)
        return r.to_pandas() if hasattr(r, "to_pandas") else r

    net = df("network_stats").iloc[0]
    sections = [
        "<h1>Pipeline report</h1>",
        f'<p class="sub">source: {html.escape(sf_dir)} · '
        f'{html.escape(str(net["first_ts"]))} → {html.escape(str(net["last_ts"]))}</p>',
        stat_tiles(
            [
                ("Total events", net["total_events"]),
                ("Users", net["n_users"]),
                ("Event types", net["n_event_types"]),
                ("Total value", net["total_value"]),
                ("Top user", f'#{net["top_user_id"]}'),
            ]
        ),
        bar_chart(
            df("trending_words")
            .sort_values(["trend_score", "word"], ascending=[False, True])
            .head(10),
            "word",
            "trend_score",
            "Trending topics",
        ),
        bar_chart(df("top_users_by_value"), "user_id", "total_value",
                  "Top users by value"),
        column_chart(df("hour_histogram").sort_values("hour"), "hour", "n",
                     "Activity by hour"),
        line_chart(
            df("daily_signup_growth").assign(
                day=lambda d: d["day"].astype(str).str.slice(5, 10)
            ),
            "day",
            "n",
            "Daily signups",
        ),
        health_table(df("lake_health").sort_values("health").head(8),
                     "Lake partition health (worst 8)"),
    ]
    body = "".join(sections)
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<meta name='viewport' content='width=device-width, initial-scale=1'>"
        f"<title>Pipeline report</title><style>{_CSS}</style></head>"
        f"<body>{body}</body></html>"
    )
