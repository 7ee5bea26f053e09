"""HTML report writer (whylogs_spark/viz.py): structure, stat content,
inline SVG histograms, drift categories, escaping, file round trip."""

import pytest

import whylogs_spark as wsp
from whylogs_spark import viz


@pytest.fixture(scope="module")
def li_view(lineitem):
    return wsp.profile(
        lineitem.select("l_quantity", "l_extendedprice",
                        "l_returnflag")).cache()


def test_profile_report_structure(li_view):
    html = viz.profile_report_html(li_view, title="Lineitem <profile>")
    assert html.startswith("<!doctype html>")
    assert "Lineitem &lt;profile&gt;" in html       # escaped title
    for col in ("l_quantity", "l_extendedprice", "l_returnflag"):
        assert f"<h2>{col}</h2>" in html
    assert "<svg" in html                            # KLL histograms
    assert "distinct est" in html and "stddev" in html
    # self-contained: no external refs
    assert "http-equiv" not in html and "src=" not in html


def test_drift_report_categories_and_overlay(lineitem):
    a = wsp.profile(lineitem.filter("l_extendedprice < 50000")
                    .select("l_extendedprice", "l_quantity"))
    b = wsp.profile(lineitem.filter("l_extendedprice >= 50000")
                    .select("l_extendedprice", "l_quantity"))
    html = viz.drift_report_html(a, b)
    assert 'class="cat-DRIFT"' in html               # price split drifts
    assert "l_extendedprice" in html and "l_quantity" in html
    # overlaid histograms: two svg blocks inside a card
    assert html.count("<svg") >= 4


def test_write_html_roundtrip(li_view, tmp_path):
    p = tmp_path / "report.html"
    viz.write_html(str(p), viz.profile_report_html(li_view))
    text = p.read_text(encoding="utf-8")
    assert text.startswith("<!doctype html>") and text.endswith("</html>")


def test_constraints_report_html(li_view):
    from whylogs_spark.core import constraints as C

    rep = (C.ConstraintsBuilder(li_view)
           .add(C.no_missing_values("l_quantity"))
           .add(C.mean_between_range("l_quantity", 1000, 2000))  # fail
           .build().report())
    html = viz.constraints_report_html(rep)
    assert "1/2 constraints pass" in html
    assert ">PASS<" in html and ">FAIL<" in html
    assert "l_quantity has no missing values" in html


def test_profile_report_segmented_histograms(lineitem):
    html = viz.profile_report_html(
        wsp.profile(lineitem.select("l_quantity", "l_returnflag"),
                    segment_by=["l_returnflag"]))
    # one card per (segment, column) with a real per-segment histogram
    assert html.count("segment ") >= 3
    assert html.count("<svg") >= 3



def test_model_report_html(spark, tmp_path):
    import numpy as np

    from whylogs_spark.viz import model_report_html, write_html

    rng = np.random.default_rng(31)
    n = 2000
    y = (rng.random(n) < 0.3).astype(int)
    s = np.clip(rng.normal(0.35 + 0.3 * y, 0.15), 0, 1)
    df = spark.createDataFrame(
        [(float(a), int(b), int(a > 0.5)) for a, b in zip(s, y)],
        "score double, label int, pred int")
    html_text = model_report_html(df, "score", "label",
                                  prediction_col="pred")
    assert html_text.startswith("<!doctype html>")
    assert "ROC-AUC" in html_text and "average precision" in html_text
    assert "reliability" in html_text and "confusion matrix" in html_text
    assert html_text.count("<svg") >= 4
    # numbers render (auc ~0.85 for this separation)
    from whylogs_spark.core.model_perf import roc_auc_exact
    auc = roc_auc_exact(df, "score", "label").first().auc
    assert f"{auc:.6g}"[:6] in html_text
    out = tmp_path / "model.html"
    write_html(str(out), html_text)
    assert out.read_text().startswith("<!doctype html>")
    # no external deps: no script/link tags
    assert "<script" not in html_text and "<link" not in html_text


def test_model_report_reliability_uses_shared_scale(spark):
    """An overconfident model (conf 0.95, observed acc 0.5) must show
    DIFFERENT bar heights for confidence vs accuracy — per-SVG peak
    normalization would render both at full height and display perfect
    calibration for a badly miscalibrated model."""
    import re

    from whylogs_spark.core.model_perf import expected_calibration_error
    from whylogs_spark.viz import model_report_html

    rows = [(0.95, 1)] * 50 + [(0.95, 0)] * 50
    df = spark.createDataFrame(rows, "score double, label int")
    html_text = model_report_html(df, "score", "label")
    rel_card = html_text.split("<h2>reliability</h2>")[1]
    svgs = re.findall(r"<svg.*?</svg>", rel_card, re.S)
    conf_svg, acc_svg = svgs[0], svgs[1]
    conf_h = max(float(h) for h in
                 re.findall(r'height="([0-9.]+)"', conf_svg)[1:] or [0])
    acc_h = max(float(h) for h in
                re.findall(r'height="([0-9.]+)"', acc_svg)[1:] or [0])
    # conf bar ~0.95 of scale, acc bar ~0.5 of scale
    assert conf_h > acc_h * 1.5
    # the driver-side ECE/MCE arithmetic matches the distributed one
    ece = expected_calibration_error(df, "score", "label").first()
    assert f"{ece.ece:.6g}" in html_text
    assert f"{ece.mce:.6g}" in html_text


class TestCorpusReport:
    def test_corpus_report_sections_and_counts(self, spark, tmp_path):
        from whylogs_spark.viz import corpus_report_html, write_html

        rows = []
        for i in range(40):
            txt = ("a perfectly reasonable sentence about data with "
                   f"some variety number {i} and the usual words")
            rows.append((i, "en" if i % 4 else "fr",
                         f"src{i % 3}", txt))
        # exact duplicates: 4 copies of one text
        for j in range(4):
            rows.append((100 + j, "en", "src0",
                         "identical duplicated document text here"))
        rows.append((200, "en", "src1", None))
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, source string, text string")
        html_text = corpus_report_html(
            df, lang_col="lang", source_col="source",
            title="My corpus")
        assert "My corpus" in html_text
        for section in ("headline", "quality score", "document length",
                        "language mix", "source mix"):
            assert section in html_text
        assert "<svg" in html_text
        # headline numbers: 45 docs, 1 null, dup estimate ~3
        assert "<td>45</td>" in html_text
        assert "en" in html_text and "fr" in html_text
        p = tmp_path / "corpus.html"
        write_html(str(p), html_text)
        assert p.read_text().startswith("<!doctype html>")

    def test_corpus_report_handles_empty(self, spark):
        from whylogs_spark.viz import corpus_report_html

        empty = spark.createDataFrame([], "doc_id long, text string")
        html_text = corpus_report_html(empty)
        assert "headline" in html_text


def test_corpus_report_dup_estimate_with_null_text(spark):
    """xxhash64(NULL) returns the seed constant: the dup estimate must
    null-gate the hash so a null-text row neither counts as a distinct
    value nor eats one duplicate."""
    from whylogs_spark.viz import corpus_report_html

    rows = [(i, f"unique text number {i} with words") for i in range(20)]
    rows += [(100 + j, "identical duplicated text") for j in range(4)]
    rows.append((200, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    html_text = corpus_report_html(df)
    # 25 docs, 1 null, 21 distinct texts -> 3 duplicates exactly
    # (approx_count_distinct is exact at this cardinality)
    assert "<td>3</td>" in html_text
    assert "<td>0.12</td>" in html_text  # 3/25
