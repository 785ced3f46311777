"""HTML text extraction — the boilerplate-removal step every
crawl-curation pipeline (C4, RefinedWeb, Gopher's MassiveWeb) runs
before any text-level operator sees a document.

Beyond-reference surface: the reference engine has no HTML handling;
this is the ingest edge of the LLM-data family here.

- synth_html:         deterministic HTML wrapper around a text column
                      (pure builtins — title/nav/footer boilerplate,
                      escaped <h1> + <p> content blocks, script/style
                      noise), so extraction has an exact closed-form
                      round-trip oracle on the synthetic corpus.
- extract_html_text:  stdlib ``html.parser`` extraction via
                      Arrow-batched mapInPandas: script/style/comment
                      suppression, entity decoding, block segmentation
                      on structural tags, and per-block LINK-DENSITY
                      boilerplate dropping (nav bars and footers are
                      mostly anchor text; body prose is not) — the
                      jusText/trafilatura core heuristic in its
                      simplest defensible form.

Scale: per-document work, zero shuffle — the same mapInPandas shape as
multimodal decode (multimodal.py); a 100 TB crawl partition-parallelizes
and the extractor is the only Python in the job.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("n_blocks", LongType(), True),
        StructField("n_dropped_blocks", LongType(), True),
    ]
)

# block-level elements: flush the running text block at their
# boundaries (both open and close), the standard segmentation set
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd nav header footer "
    "section article aside main table thead tbody tr td th br hr "
    "blockquote pre form figure figcaption".split()
)
# subtree content that is never prose
_SKIP_TAGS = frozenset("script style noscript template head title svg "
                       "iframe object".split())
_VOID_TAGS = frozenset("br hr img meta link input".split())


def _extract_blocks(html: str) -> list[tuple[str, float]]:
    """Parse HTML into (block_text, link_density) pairs.

    Entities are decoded (convert_charrefs), script/style/head
    subtrees and comments contribute nothing, text is segmented at
    block-tag boundaries, and each block tracks the fraction of its
    characters that sit inside <a> elements. Whitespace inside a block
    collapses to single spaces. Tolerant of malformed input — the
    stdlib parser never raises on stray tags; unclosed blocks flush at
    EOF.
    """
    from html.parser import HTMLParser

    blocks: list[tuple[str, float]] = []

    class _P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.link_chars = 0
            self.total_chars = 0
            self.skip = 0
            self.link = 0

        def _flush(self):
            text = " ".join(" ".join(self.parts).split())
            if text:
                density = (self.link_chars / self.total_chars
                           if self.total_chars else 0.0)
                blocks.append((text, density))
            self.parts = []
            self.link_chars = 0
            self.total_chars = 0

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
                self.skip += 1
            if tag in _BLOCK_TAGS:
                self._flush()
            if tag == "a":
                self.link += 1

        def handle_endtag(self, tag):
            if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
                self.skip = max(0, self.skip - 1)
            if tag in _BLOCK_TAGS:
                self._flush()
            if tag == "a":
                self.link = max(0, self.link - 1)

        def handle_data(self, data):
            if self.skip:
                return
            stripped = " ".join(data.split())
            if not stripped:
                return
            self.parts.append(stripped)
            self.total_chars += len(stripped)
            if self.link:
                self.link_chars += len(stripped)

    p = _P()
    p.feed(html or "")
    p.close()
    p._flush()
    return blocks


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
    on_error: str = "fail",
) -> DataFrame:
    """(doc_id, text, n_blocks, n_dropped_blocks): main-content text
    from an HTML column. Blocks whose link density exceeds
    ``max_link_density`` are dropped (nav/footer/related-links
    boilerplate); survivors join with newlines. ``on_error`` follows
    the multimodal decode contract: 'fail' raises, 'null' emits the
    row with null text, 'skip' drops it — the stdlib parser itself is
    error-tolerant, so these only fire on pathological inputs (e.g.
    non-string values).
    """
    if on_error not in ("fail", "null", "skip"):
        raise ValueError(f"on_error must be fail|null|skip, got {on_error!r}")
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError(
            f"max_link_density must be in [0, 1], got {max_link_density}")
    pruned = df.select(F.col(id_col).alias("doc_id"),
                       F.col(html_col).alias("_html"))
    # the Python parse is a narrow mapInPandas — spread doc rows to
    # shuffle width when the scan has fewer splits, so a compact
    # corpus doesn't serialize parsing onto 2 cores (no-op at 100 TB)
    from .common import spread_narrow

    pruned = spread_narrow(pruned, "doc_id")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "text": [], "n_blocks": [],
                   "n_dropped_blocks": []}
            for did, html in zip(pdf["doc_id"], pdf["_html"]):
                try:
                    blocks = _extract_blocks(html)
                    kept = [t for t, d in blocks if d <= max_link_density]
                    text = "\n".join(kept)
                    nb, nd = len(blocks), len(blocks) - len(kept)
                except (TypeError, ValueError, AttributeError):
                    if on_error == "fail":
                        raise
                    if on_error == "skip":
                        continue
                    text = nb = nd = None
                out["doc_id"].append(did)
                out["text"].append(text)
                out["n_blocks"].append(nb)
                out["n_dropped_blocks"].append(nd)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return pruned.mapInPandas(run, EXTRACT_SCHEMA)


def synth_html(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column in a deterministic, realistic HTML page —
    pure builtins, so the page (and therefore the extraction result)
    is a closed-form function of the input row:

    head (title + style + script noise), a nav bar and a footer that
    are 100% anchor text (the extractor must drop both at any
    link-density threshold < 1), an <h1> "Doc {id}", and the document
    text as one or two <p> blocks (split at ceil(n/2) words when the
    doc has >= 2 words) with &/</> HTML-escaped. Extraction recovers
    exactly:  "Doc {id}\\n{first-half}\\n{second-half}".
    """
    txt = F.col(text_col)
    esc = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(txt, "&", "&amp;"),
                         "<", "&lt;"), ">", "&gt;")
    ws = F.split(F.trim(esc), r"\s+")
    n = F.when(F.length(F.trim(esc)) == 0, F.lit(0)).otherwise(F.size(ws))
    half = F.ceil(n / 2).cast("int")
    inner = df.select(
        "*", ws.alias("_ws"), half.alias("_half"), n.alias("_n"))
    p1 = F.concat_ws(" ", F.slice(F.col("_ws"), 1, F.col("_half")))
    p2 = F.concat_ws(" ", F.expr("slice(_ws, _half + 1, size(_ws))"))
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Synthetic page</title>"
              "<style>body{margin:0}</style>"
              "<script>var tracker = 'noise';</script></head><body>"
              "<!-- generated -->"
              "<nav><a href='/'>Home</a> <a href='/about'>About</a> "
              "<a href='/contact'>Contact</a></nav>"
              "<main><h1>Doc "),
        F.col(id_col).cast("string"),
        F.lit("</h1><p>"),
        p1,
        F.when(F.col("_n") >= 2, F.concat(F.lit("</p><p>"), p2))
        .otherwise(F.lit("")),
        F.lit("</p></main>"
              "<footer><a href='/terms'>Terms</a> "
              "<a href='/privacy'>Privacy</a></footer></body></html>"),
    )
    return inner.select(F.col(id_col), html.alias("html"))
