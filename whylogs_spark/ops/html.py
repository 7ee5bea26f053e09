"""HTML → text extraction — the step between a crawl and a corpus.

Two kernels behind one API, chosen by ``impl``:

* ``"sql"`` (default, the scale path): a chain of codegen
  ``regexp_replace`` projections — drop ``<script>``/``<style>``/
  ``<head>`` blocks and comments, strip remaining tags (block-level
  tags become newlines so paragraph structure survives for the
  line-dedup family), decode the common entities, collapse whitespace.
  Zero shuffle, zero Python; at 100 TB this is the one to run.
* ``"parser"``: stdlib ``html.parser`` in an Arrow-batched
  ``mapInPandas`` — tracks real element nesting (handles unclosed
  tags, entity references, CDATA) at Python cost. Use when
  fidelity beats throughput, or to audit the sql kernel's error rate
  on a sample.

Reference scope: whylogs has no HTML surface; pairs with io.warc and
the dedup/quality families for the crawl→corpus pipeline.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_TAGS = ("p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
               "header|footer|blockquote|pre")

# &amp; must decode LAST: decoding it first would turn the escaped
# sequence '&amp;lt;' into '&lt;' and a later pass into '<' —
# double-unescaping that diverges from a single-pass HTML decode
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
             ("&amp;", "&")]


def html_to_text_col(c: Column) -> Column:
    """The sql kernel as a reusable Column expression."""
    # kill non-content blocks first (their text is never corpus text)
    x = F.regexp_replace(c, r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    # block-level boundaries -> newline so lines stay meaningful
    x = F.regexp_replace(x, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES[:-1]:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, r"&#(\d+);", " ")  # rare numeric entities
    # ... and &amp; last of all (see _ENTITIES note)
    x = F.replace(x, F.lit("&amp;"), F.lit("&"))
    # collapse: spaces/tabs within lines, blank lines between them
    x = F.regexp_replace(x, r"[ \t\r\f]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{2,}", "\n")
    # trim() strips only spaces; newlines at the edges go via regexp
    return F.regexp_replace(F.trim(x), r"^\n+|\n+$", "")


def extract_title(c: Column) -> Column:
    t = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_links(c: Column) -> Column:
    """Array of href targets (absolute and relative)."""
    return F.regexp_extract_all(
        c, F.lit("(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"), F.lit(1))


TEXT_SCHEMA_FIELDS = [
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
]


def _parser_extract(html: str):
    """stdlib html.parser kernel: (title, text with block newlines)."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts = []
            self.title = []
            self.skip = 0
            self.in_title = False

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "noscript"):
                self.skip += 1
            elif tag == "title":
                self.in_title = True
            elif tag in ("p", "div", "br", "li", "ul", "ol", "tr",
                         "table", "section", "article", "header",
                         "footer", "blockquote", "pre") \
                    or tag.startswith("h"):
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in ("script", "style", "noscript"):
                self.skip = max(self.skip - 1, 0)
            elif tag == "title":
                self.in_title = False
            else:
                self.handle_starttag(tag, [])

        def handle_data(self, data):
            if self.in_title:
                self.title.append(data)
            elif not self.skip:
                self.parts.append(data)

    p = _X()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    import re as _re

    text = "".join(p.parts)
    text = _re.sub(r"[ \t\r\f]+", " ", text)
    text = _re.sub(r" ?\n ?", "\n", text)
    text = _re.sub(r"\n{2,}", "\n", text)
    title = _re.sub(r"\s+", " ", "".join(p.title)).strip()
    return title, text.strip()


def html_to_text(
    df: DataFrame, html_col: str = "payload", impl: str = "sql"
) -> DataFrame:
    """Append ``title`` and ``text`` extracted from ``html_col``."""
    if impl == "sql":
        return df.withColumn(
            "title", extract_title(F.col(html_col))
        ).withColumn("text", html_to_text_col(F.col(html_col)))
    if impl != "parser":
        raise ValueError(f"impl must be 'sql' or 'parser', got {impl!r}")

    out_schema = T.StructType(
        list(df.schema.fields) + TEXT_SCHEMA_FIELDS)
    names = [f.name for f in out_schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [_parser_extract(h) for h in pdf[html_col]]
            pdf = pdf.copy()
            pdf["title"] = [t for t, _ in pairs]
            pdf["text"] = [x for _, x in pairs]
            yield pdf[names]

    return df.mapInPandas(kernel, out_schema)
