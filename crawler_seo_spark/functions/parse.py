"""HTML parse + analysis as one Arrow-vectorized Spark stage.

One ``pandas_udf`` call per page batch produces a single ``analysis`` struct
column holding everything extractable from the page in isolation: metatags,
heading analysis, mixed content, outgoing links (canonicalized + filtered),
the filtered-link log entries, and embedded image references.

Cross-page, order-dependent outputs (duplicate flags, scores, warnings) are
deliberately NOT here — they are Catalyst window/column expressions in
:mod:`crawler_seo_spark.plans.enrich`, keeping the Python surface minimal
(reference fuses all of this per-row in threads; we split by *where it runs
best*: parse in Arrow batches, relational logic in the JVM).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analyzers import (
    analyze_headings,
    analyze_metatags,
    analyze_mixed_content,
    extract_filtered,
    extract_links,
)
from .htmldoc import parse_html

_PROBLEM_STRUCT = T.StructType([
    T.StructField("descricao", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("posicao", T.IntegerType()),
    T.StructField("texto", T.StringType()),
    T.StructField("motivos", T.ArrayType(T.StringType())),
    T.StructField("gravidade", T.StringType()),
])

_MIXED_STRUCT = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("attribute", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("element", T.StringType()),
    T.StructField("category", T.StringType()),
])

_FILTERED_STRUCT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("reason", T.StringType()),
])

_IMAGE_REF_STRUCT = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("alt", T.StringType()),
    T.StructField("src", T.StringType()),
])

ANALYSIS_SCHEMA = T.StructType([
    # metatags (C5-C7)
    T.StructField("title", T.StringType()),
    T.StructField("title_length", T.IntegerType()),
    T.StructField("meta_description", T.StringType()),
    T.StructField("description_length", T.IntegerType()),
    T.StructField("meta_keywords", T.StringType()),
    T.StructField("meta_robots", T.StringType()),
    T.StructField("meta_viewport", T.StringType()),
    T.StructField("canonical_url", T.StringType()),
    T.StructField("og_title", T.StringType()),
    T.StructField("og_description", T.StringType()),
    T.StructField("og_image", T.StringType()),
    T.StructField("has_open_graph", T.BooleanType()),
    # headings (C8-C14)
    T.StructField("h1_count", T.IntegerType()),
    T.StructField("h1_text", T.StringType()),
    T.StructField("h1_ausente", T.BooleanType()),
    T.StructField("h1_multiple", T.BooleanType()),
    T.StructField("hierarquia_correta", T.BooleanType()),
    T.StructField("problemas_hierarquia", T.ArrayType(T.StringType())),
    T.StructField("heading_sequence", T.ArrayType(T.StringType())),
    T.StructField("heading_sequence_valida", T.ArrayType(T.StringType())),
    T.StructField("headings_problematicos", T.ArrayType(_PROBLEM_STRUCT)),
    T.StructField("headings_problematicos_count", T.IntegerType()),
    T.StructField("headings_vazios_count", T.IntegerType()),
    T.StructField("headings_ocultos_count", T.IntegerType()),
    T.StructField("headings_criticos", T.IntegerType()),
    T.StructField("total_problemas_headings", T.IntegerType()),
    # mixed content (C20)
    T.StructField("has_mixed_content", T.BooleanType()),
    T.StructField("mixed_content_count", T.IntegerType()),
    T.StructField("critical_mixed_count", T.IntegerType()),
    T.StructField("passive_mixed_count", T.IntegerType()),
    T.StructField("mixed_content_resources", T.ArrayType(_MIXED_STRUCT)),
    # link extraction (C4) + filtered log entries
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("filtered", T.ArrayType(_FILTERED_STRUCT)),
    # image payload references
    T.StructField("images", T.ArrayType(_IMAGE_REF_STRUCT)),
])


def analyze_page(html: str | None, url: str, base_domain: str | None,
                 want_links: bool) -> dict:
    """Single-page kernel (shared with the oracle via the same sub-kernels)."""
    doc = parse_html(html)
    h = analyze_headings(doc)
    m = analyze_metatags(doc)
    mc = analyze_mixed_content(doc, url)
    links: list[str] = []
    filtered: list[dict] = []
    if want_links:
        links = extract_links(doc, url, base_domain)
        filtered = [{"url": u, "reason": r}
                    for u, r in extract_filtered(doc, url, base_domain)]
    images = [
        {"image_id": img.attr("data-image-id"), "alt": img.attr("alt"),
         "src": img.attr("src")}
        for img in doc.imgs if "data-image-id" in img.attrs
    ]
    return {
        "title": m["title"], "title_length": m["title_length"],
        "meta_description": m["meta_description"],
        "description_length": m["description_length"],
        "meta_keywords": m["meta_keywords"], "meta_robots": m["meta_robots"],
        "meta_viewport": m["meta_viewport"], "canonical_url": m["canonical_url"],
        "og_title": m["og_title"], "og_description": m["og_description"],
        "og_image": m["og_image"], "has_open_graph": m["has_open_graph"],
        "h1_count": h["h1_count"], "h1_text": h["h1_text"],
        "h1_ausente": h["h1_ausente"], "h1_multiple": h["h1_multiple"],
        "hierarquia_correta": h["hierarquia_correta"],
        "problemas_hierarquia": h["problemas_hierarquia"],
        "heading_sequence": h["heading_sequence"],
        "heading_sequence_valida": h["heading_sequence_valida"],
        "headings_problematicos": h["headings_problematicos"],
        "headings_problematicos_count": h["headings_problematicos_count"],
        "headings_vazios_count": h["headings_vazios_count"],
        "headings_ocultos_count": h["headings_ocultos_count"],
        "headings_criticos": h["headings_gravidade_critica"],
        "total_problemas_headings": h["total_problemas_headings"],
        "has_mixed_content": mc["has_mixed_content"],
        "mixed_content_count": mc["mixed_content_count"],
        "critical_mixed_count": mc["critical_mixed_count"],
        "passive_mixed_count": mc["passive_mixed_count"],
        "mixed_content_resources": mc["mixed_content_resources"],
        "links": links, "filtered": filtered, "images": images,
    }


def make_analyze_udf(base_domain: str | None):
    """Arrow-batched analysis UDF: (html, url, want_links) → analysis struct.

    ``base_domain`` is captured by value (small string) — cheap closure, no
    broadcast needed.
    """
    @F.pandas_udf(ANALYSIS_SCHEMA)
    def _analyze(html: pd.Series, url: pd.Series,
                 want_links: pd.Series) -> pd.DataFrame:
        rows = [
            analyze_page(h, u, base_domain, bool(w))
            for h, u, w in zip(html.to_numpy(), url.to_numpy(),
                               want_links.to_numpy())
        ]
        return pd.DataFrame(rows)

    return _analyze


def analysis_column(html: Column, url: Column, want_links: Column,
                    base_domain: str | None) -> Column:
    return make_analyze_udf(base_domain)(html, url, want_links)
