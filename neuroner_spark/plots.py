"""Dependency-free SVG renders of the reference's evaluation plots
(the plot half of the K3 metrics sink).

Reference parity: ``src/utils_plots.py :: plot_classification_report``
(≈L40–120) renders a per-class precision/recall/f1-score heatmap with
a support column, and ``src/utils_plots.py :: heatmap`` (≈L10–40) is
the generic matrix render used for the token confusion matrix; both
are saved per evaluation epoch by ``src/evaluate.py :: save_results``
(≈L305–330) as .pdf/.png.  This container has no matplotlib, so this
module emits self-contained SVG — the same information, viewable in
any browser — instead of declaring the plots out of scope.

Altitude note: rendering is DRIVER-SIDE BY DESIGN.  The inputs are
tiny aggregated tables (one row per class, or #gold-classes ×
#pred-classes confusion cells — bounded by the label alphabet, never
by the corpus), produced distributed by ``operators/metrics.py``.
The plot step touches no DataFrame.
"""

from __future__ import annotations

import os
from html import escape

# three-stop sequential ramp (light -> mid -> dark blue), perceptually
# ordered like the reference's default cmap; pure-python interpolation
_STOPS = [(247, 251, 255), (107, 174, 214), (8, 48, 107)]

CELL_W = 86
CELL_H = 30
LABEL_W = 120
HEADER_H = 28
TITLE_H = 26
PAD = 8


def _lerp(a: float, b: float, t: float) -> float:
    return a + (b - a) * t


def _color(v: float) -> str:
    """Map v in [0, 1] onto the sequential ramp as '#rrggbb'."""
    v = min(1.0, max(0.0, v))
    seg = min(int(v * (len(_STOPS) - 1)), len(_STOPS) - 2)
    t = v * (len(_STOPS) - 1) - seg
    r, g, b = (round(_lerp(_STOPS[seg][i], _STOPS[seg + 1][i], t)) for i in range(3))
    return f"#{r:02x}{g:02x}{b:02x}"


def _text_color(bg: str) -> str:
    r, g, b = (int(bg[i : i + 2], 16) for i in (1, 3, 5))
    # ITU-R BT.601 luma — white text on dark cells
    return "#ffffff" if (0.299 * r + 0.587 * g + 0.114 * b) < 140 else "#1a1a1a"


def render_heatmap(
    values,
    row_labels,
    col_labels,
    title: str = "",
    cell_text=None,
    vmin: float | None = None,
    vmax: float | None = None,
) -> str:
    """Generic matrix heatmap → SVG string (reference ``utils_plots.py
    :: heatmap``).  ``values`` is rows × cols of float-or-None (None →
    blank cell); ``cell_text`` optionally overrides the per-cell label
    (same shape); shading is min-max normalized over the non-None
    values unless vmin/vmax pin the scale (pass 0/1 for P/R/F1)."""
    n_rows, n_cols = len(values), len(col_labels)
    flat = [v for row in values for v in row if v is not None]
    lo = vmin if vmin is not None else (min(flat) if flat else 0.0)
    hi = vmax if vmax is not None else (max(flat) if flat else 1.0)
    span = (hi - lo) or 1.0

    width = LABEL_W + n_cols * CELL_W + 2 * PAD
    height = TITLE_H + HEADER_H + n_rows * CELL_H + 2 * PAD
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="sans-serif" font-size="12">',
        f'<rect width="{width}" height="{height}" fill="#ffffff"/>',
    ]
    if title:
        out.append(
            f'<text x="{width / 2:.0f}" y="{TITLE_H - 8}" text-anchor="middle" '
            f'font-size="14" font-weight="bold">{escape(title)}</text>'
        )
    y0 = TITLE_H + HEADER_H
    for j, cl in enumerate(col_labels):
        x = PAD + LABEL_W + j * CELL_W + CELL_W / 2
        out.append(
            f'<text x="{x:.0f}" y="{y0 - 8}" text-anchor="middle" '
            f'font-weight="bold">{escape(str(cl))}</text>'
        )
    for i, rl in enumerate(row_labels):
        y = y0 + i * CELL_H
        out.append(
            f'<text x="{PAD + LABEL_W - 6}" y="{y + CELL_H / 2 + 4:.0f}" '
            f'text-anchor="end">{escape(str(rl))}</text>'
        )
        for j in range(n_cols):
            x = PAD + LABEL_W + j * CELL_W
            v = values[i][j]
            if v is None:
                fill, tcol, label = "#f2f2f2", "#9a9a9a", ""
            else:
                fill = _color((v - lo) / span)
                tcol = _text_color(fill)
                label = f"{v:.3f}" if isinstance(v, float) else str(v)
            if cell_text is not None and cell_text[i][j] is not None:
                label = str(cell_text[i][j])
            out.append(
                f'<rect x="{x}" y="{y}" width="{CELL_W}" height="{CELL_H}" '
                f'fill="{fill}" stroke="#ffffff"/>'
            )
            if label:
                out.append(
                    f'<text x="{x + CELL_W / 2:.0f}" y="{y + CELL_H / 2 + 4:.0f}" '
                    f'text-anchor="middle" fill="{tcol}">{escape(label)}</text>'
                )
    out.append("</svg>")
    return "\n".join(out)


def plot_classification_report(per_type: dict, title: str = "classification report") -> str:
    """Per-class precision/recall/f1 heatmap with a support column
    (reference ``utils_plots.py :: plot_classification_report``).
    ``per_type`` maps class → row dict with precision/recall/f1 and
    tp/fn (support = tp + fn, gold occurrences), exactly the
    ``results.json`` ``per_type`` payload.  Entity classes sort
    alphabetically; the micro-average ALL row renders last, as in the
    reference's report layout."""
    classes = sorted(c for c in per_type if c != "ALL") + (
        ["ALL"] if "ALL" in per_type else []
    )
    values, texts = [], []
    for c in classes:
        r = per_type[c]
        support = int(r.get("tp", 0)) + int(r.get("fn", 0))
        values.append([float(r["precision"]), float(r["recall"]), float(r["f1"]), None])
        texts.append([None, None, None, str(support)])
    return render_heatmap(
        values,
        classes,
        ["precision", "recall", "f1", "support"],
        title=title,
        cell_text=texts,
        vmin=0.0,
        vmax=1.0,
    )


def plot_confusion_matrix(rows, title: str = "confusion matrix") -> str:
    """Gold × predicted confusion heatmap (reference ``utils_plots.py
    :: heatmap`` as called on the token confusion matrix).  ``rows``
    is (gold, pred, n) tuples/Rows from
    ``operators.metrics.confusion_matrix``; shading is row-normalized
    (each gold class's distribution over predictions) so rare classes
    stay readable next to 'O'; cell text is the raw count."""
    triples = [(r[0], r[1], int(r[2])) for r in rows]
    labels = sorted({g for g, _, _ in triples} | {p for _, p, _ in triples})
    idx = {l: i for i, l in enumerate(labels)}
    counts = [[0] * len(labels) for _ in labels]
    for g, p, n in triples:
        counts[idx[g]][idx[p]] += n
    values, texts = [], []
    for i in range(len(labels)):
        row_total = sum(counts[i]) or 1
        values.append([counts[i][j] / row_total if counts[i][j] else None for j in range(len(labels))])
        texts.append([str(counts[i][j]) if counts[i][j] else None for j in range(len(labels))])
    return render_heatmap(
        values, labels, labels, title=title, cell_text=texts, vmin=0.0, vmax=1.0
    )


def save_report_plots(out_dir: str, per_type: dict, confusion_rows, split: str = "valid") -> dict:
    """Write both SVGs under <out_dir>/plots/ (the run-tree slot where
    the reference drops its per-epoch .png/.pdf).  Returns the paths."""
    plots_dir = os.path.join(out_dir, "plots")
    os.makedirs(plots_dir, exist_ok=True)
    paths = {}
    for name, svg in (
        ("classification_report", plot_classification_report(per_type, f"classification report ({split})")),
        ("confusion_matrix", plot_confusion_matrix(confusion_rows, f"confusion matrix ({split})")),
    ):
        path = os.path.join(plots_dir, f"{name}_{split}.svg")
        with open(path, "w") as f:
            f.write(svg)
        paths[name] = path
    return paths
