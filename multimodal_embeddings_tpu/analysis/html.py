"""Shared HTML report scaffolding for comparison/cluster reports."""

from __future__ import annotations

import html
import os
from typing import Iterable, List, Optional, Sequence, Tuple

STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 24px; background: #fafafa; color: #222; }
h1, h2 { color: #1a1a2e; }
.card { background: #fff; border: 1px solid #ddd; border-radius: 8px;
        padding: 14px; margin: 12px 0; box-shadow: 0 1px 3px rgba(0,0,0,.06); }
.grid { display: flex; flex-wrap: wrap; gap: 14px; }
.item { width: 280px; text-align: center; }
.item img { max-width: 100%; max-height: 240px; border: 1px solid #ccc; }
.score { font-weight: 600; color: #0a6; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ccc; padding: 5px 9px; }
a { color: #2456a4; text-decoration: none; }
.matrix td { min-width: 34px; text-align: center; font-size: 11px; }
"""


def page(title: str, body: str) -> str:
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title><style>{STYLE}</style></head>"
        f"<body><h1>{html.escape(title)}</h1>{body}</body></html>"
    )


def write_page(path: str, title: str, body: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(page(title, body))


def image_card(
    image_path: str,
    caption: str,
    score: Optional[float] = None,
    link: Optional[str] = None,
) -> str:
    img = (
        f"<img src='{html.escape(image_path)}' loading='lazy'>"
        if image_path
        else "<div style='height:120px'></div>"
    )
    if link:
        img = f"<a href='{html.escape(link)}'>{img}</a>"
    score_html = f"<div class='score'>{score:.4f}</div>" if score is not None else ""
    return (
        f"<div class='item card'>{img}{score_html}"
        f"<div>{html.escape(caption)}</div></div>"
    )


def link_list(entries: Sequence[Tuple[str, str]]) -> str:
    items = "".join(
        f"<li><a href='{html.escape(href)}'>{html.escape(text)}</a></li>"
        for text, href in entries
    )
    return f"<ul>{items}</ul>"


def table(headers: Sequence[str], rows: Iterable[Sequence[str]], cls: str = "") -> str:
    head = "".join(f"<th>{html.escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{cell}</td>" for cell in row) + "</tr>" for row in rows
    )
    return f"<table class='{cls}'><tr>{head}</tr>{body}</table>"


def colored_cell(value: float) -> str:
    """Similarity-shaded matrix cell (green high, white low)."""
    g = int(255 - min(max(value, 0.0), 1.0) * 120)
    return (
        f"<td style='background: rgb({g},255,{g})'>{value:.2f}</td>"
    )
