"""K3 plot half: dependency-free SVG heatmaps (reference
src/utils_plots.py parity).  Pure driver-side renders — no Spark
fixture needed."""

import xml.etree.ElementTree as ET

from neuroner_spark.plots import (
    _color,
    plot_classification_report,
    plot_confusion_matrix,
    render_heatmap,
    save_report_plots,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


def _parse(svg: str):
    root = ET.fromstring(svg)
    rects = root.findall(f"{SVG_NS}rect")
    texts = [t.text for t in root.findall(f"{SVG_NS}text")]
    return root, rects, texts


def test_color_ramp_monotonic_and_bounded():
    # the sequential ramp must darken monotonically with value so the
    # heatmap reads correctly (luma strictly decreasing along v)
    def luma(h):
        r, g, b = (int(h[i : i + 2], 16) for i in (1, 3, 5))
        return 0.299 * r + 0.587 * g + 0.114 * b

    lumas = [luma(_color(v / 20)) for v in range(21)]
    assert all(a > b for a, b in zip(lumas, lumas[1:]))
    # out-of-range clamps rather than wrapping
    assert _color(-0.5) == _color(0.0) and _color(1.5) == _color(1.0)


def test_render_heatmap_structure():
    svg = render_heatmap(
        [[0.1, 0.9], [None, 0.5]],
        ["row_a", "row_b"],
        ["c1", "c2"],
        title="demo",
    )
    root, rects, texts = _parse(svg)
    # background + 4 cells
    assert len(rects) == 5
    assert "demo" in texts and "row_a" in texts and "c2" in texts
    # None cell renders blank (no value text), others formatted
    assert "0.900" in texts and "0.100" in texts and "0.500" in texts
    # higher value -> darker fill than lower value
    fills = {t: r.get("fill") for r, t in zip(rects[1:], ["a", "b", "none", "c"])}
    assert fills["none"] == "#f2f2f2"
    assert fills["b"] != fills["a"]


def test_classification_report_layout():
    per_type = {
        "ALL": {"precision": 0.9, "recall": 0.8, "f1": 0.847, "tp": 90, "fn": 22},
        "PER": {"precision": 1.0, "recall": 0.5, "f1": 0.667, "tp": 10, "fn": 10},
        "LOC": {"precision": 0.8, "recall": 0.9, "f1": 0.847, "tp": 80, "fn": 12},
    }
    svg = plot_classification_report(per_type)
    root, rects, texts = _parse(svg)
    # 3 rows x 4 cols of cells + background
    assert len(rects) == 13
    # ALL renders last: row labels appear in sorted-then-ALL order
    order = [t for t in texts if t in per_type]
    assert order == ["LOC", "PER", "ALL"]
    # support column is tp + fn as text
    assert "20" in texts and "92" in texts and "112" in texts
    assert "precision" in texts and "support" in texts


def test_confusion_matrix_square_and_counts():
    rows = [("O", "O", 95), ("O", "B-PER", 5), ("B-PER", "B-PER", 7), ("B-PER", "O", 3)]
    svg = plot_confusion_matrix(rows)
    root, rects, texts = _parse(svg)
    # 2x2 grid + background; labels on both axes
    assert len(rects) == 5
    assert texts.count("O") == 2 and texts.count("B-PER") == 2
    assert {"95", "5", "7", "3"} <= set(texts)
    # label set is the UNION of gold and pred classes (a class the
    # model never predicts still gets a column)
    svg2 = plot_confusion_matrix(rows + [("B-LOC", "O", 2)])
    _, rects2, _ = _parse(svg2)
    assert len(rects2) == 10  # 3x3 + background


def test_save_report_plots_writes_tree(tmp_path):
    per_type = {"ALL": {"precision": 1.0, "recall": 1.0, "f1": 1.0, "tp": 4, "fn": 0}}
    paths = save_report_plots(
        str(tmp_path), per_type, [("O", "O", 4)], split="valid"
    )
    for p in paths.values():
        with open(p) as f:
            ET.fromstring(f.read())  # well-formed XML
    assert (tmp_path / "plots" / "classification_report_valid.svg").exists()
    assert (tmp_path / "plots" / "confusion_matrix_valid.svg").exists()
