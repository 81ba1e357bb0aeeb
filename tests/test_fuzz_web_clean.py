"""Property-based cross-engine fuzz for the web-text repair chain:
random tag soup (nested/unclosed tags, script/style bodies with angle
brackets, comments, entities incl. the &amp;lt; double-decode trap,
mojibake sequences, stray whitespace) cleaned by BOTH the Spark
expressions (operators/cleaning.py) and the DuckDB twin built from the
same constants, compared byte-for-byte.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.cleaning import (
    HTML_ENTITIES,
    MOJIBAKE_MAP,
    clean_web_docs,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

piece = st.sampled_from(
    [
        "plain words here",
        "<p>para</p>",
        "<B>bold</B>",
        "<br/>",
        "<BR>",
        "</P>",
        "<script>if(x<2){y()}</script>",
        "<script type='a'>var q=\"<b>\";</script>",
        "<style>.x{color:red}</style>",
        "<!-- hidden <b>comment</b> -->",
        "<div class='x'>",      # unclosed tag
        "&amp;lt;",              # must decode to literal &lt;
        "&lt;tag&gt;",
        "it&#39;s",
        "a&nbsp;b",
        "&quot;q&quot;",
        "donâ€™t",
        "â€œquotedâ€“ranges",
        "cafÃ© niÃ±o Ã§a",
        "Â stray",
        "  \t spaced \t ",
        "resumÃ©â€¦",
    ]
)
doc_strategy = st.lists(piece, min_size=0, max_size=8).map(" ".join)


def _duckdb_chain() -> str:
    strip = "regexp_replace(t, '(?is)<script[^>]*>.*?</script>', '', 'g')"
    strip = f"regexp_replace({strip}, '(?is)<style[^>]*>.*?</style>', '', 'g')"
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', '', 'g')"
    strip = f"regexp_replace({strip}, '(?i)<br\\s*/?>|</p\\s*>', chr(10), 'g')"
    strip = f"regexp_replace({strip}, '<[^>]+>', '', 'g')"
    for ent, ch in HTML_ENTITIES:
        e, c = ent.replace("'", "''"), ch.replace("'", "''")
        strip = f"replace({strip}, '{e}', '{c}')"
    strip = f"regexp_replace({strip}, '[ \\t]+', ' ', 'g')"
    strip = f"regexp_replace({strip}, '^\\s+|\\s+$', '', 'g')"
    fixed = strip
    for bad, good in MOJIBAKE_MAP:
        b, g = bad.replace("'", "''"), good.replace("'", "''")
        fixed = f"replace({fixed}, '{b}', '{g}')"
    return fixed


@given(docs=st.lists(doc_strategy, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_web_clean_matches_duckdb(spark, docs):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    got = (
        clean_web_docs(sdf, "doc_id", "text")
        .select("doc_id", "n_tags", "text_clean")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '<[^>]+>'))::INT AS n_tags,
               {_duckdb_chain().replace("(t,", "(text,")} AS text_clean
        FROM docs ORDER BY doc_id
        """
    ).df().reset_index(drop=True)
    con.close()
    assert got["n_tags"].tolist() == want["n_tags"].tolist()
    assert got["text_clean"].tolist() == want["text_clean"].tolist()
