"""HTML → Markdown conversion (operators/markdown.py): golden pins for
each rule class plus the tag-name-boundary traps."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators.markdown import html_to_markdown


def _md(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_markdown(F.col("html")).alias("m")).first()["m"]


def test_headings_lists_links_bold(spark):
    html = (
        '<h1>Top</h1><h3 class="x">Sub</h3><p>see '
        '<a href="https://e.x/p">a <b>bold</b> link</a></p>'
        "<ul><li>one</li><li>two</li></ul>"
    )
    assert _md(spark, html) == (
        "# Top\n\n### Sub\n\nsee [a **bold** link](https://e.x/p)\n\n"
        "- one\n- two"
    )


def test_script_style_dropped_entities_decoded(spark):
    html = (
        "<style>p{a}</style><script>if(1<2){x()}</script>"
        "<p>A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
    )
    assert _md(spark, html) == 'A & B <ok> "q" \'s\' end'


def test_tag_name_boundaries_not_eaten(spark):
    # <body> must not trigger the <b> rule, <link> not the <li> rule,
    # <pre> not the <p> rule, <img>/<em> disambiguation
    html = '<body><link rel="x"><pre>keep</pre><img src="y"><em>it</em></body>'
    assert _md(spark, html) == "keep *it*"


def test_uppercase_tags_and_br(spark):
    assert _md(spark, "<H2>Up</H2><P>a<BR/>b</P>") == "## Up\n\na\nb"


def test_whitespace_normalization(spark):
    html = "<div>a   b</div><div></div><div>c</div>"
    assert _md(spark, html) == "a b\n\nc"


def test_null_and_plain_text(spark):
    df = spark.createDataFrame([(None,), ("plain",)], "html string")
    out = [r["m"] for r in df.select(html_to_markdown(F.col("html")).alias("m")).collect()]
    assert out == [None, "plain"]


def test_unclosed_and_hostile_fragments_never_throw(spark):
    frags = ["<b>unclosed", "<a href=", "<<<>>>", "</li></li>", "<h1>x"]
    df = spark.createDataFrame([(f,) for f in frags], "html string")
    assert df.select(html_to_markdown(F.col("html")).alias("m")).count() == 5


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(html_to_markdown(F.col("html")).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
