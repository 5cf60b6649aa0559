"""HTML table extraction (operators/tables.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.tables import extract_html_tables


def _rows(spark, html):
    df = spark.createDataFrame([("d1", html)], "url string, html_text string")
    out = extract_html_tables(df).collect()
    return {
        (r["table_idx"], r["row_idx"]): r["cells"] for r in out
    }


def test_basic_table(spark):
    html = (
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    assert _rows(spark, html) == {(0, 0): ["A", "B"], (0, 1): ["1", "2"]}


def test_two_tables_with_noise(spark):
    html = (
        '<p>x</p><table id="a"><tbody><tr><td><i>one</i></td></tr></tbody>'
        "</table><div>y</div><TABLE><TR><TD>two &amp; half</TD></TR></TABLE>"
    )
    assert _rows(spark, html) == {(0, 0): ["one"], (1, 0): ["two & half"]}


def test_empty_and_nbsp_cells(spark):
    html = "<table><tr><td></td><td>&nbsp;</td><td> x </td></tr></table>"
    assert _rows(spark, html) == {(0, 0): ["", "", "x"]}


def test_no_tables_no_rows(spark):
    df = spark.createDataFrame(
        [("d1", "<p>none</p>"), ("d2", None)], "url string, html_text string"
    )
    assert extract_html_tables(df).count() == 0


def test_ragged_rows_keep_source_order(spark):
    html = (
        "<table><tr><td>a</td><td>b</td><td>c</td></tr>"
        "<tr><td>only</td></tr></table>"
    )
    assert _rows(spark, html) == {(0, 0): ["a", "b", "c"], (0, 1): ["only"]}


def test_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([("d", "<table></table>")], "url string, html_text string")
    plan = (
        extract_html_tables(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
