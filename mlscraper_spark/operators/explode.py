"""S1/S2 — the DOM explode: pages DataFrame → nodes DataFrame.

The reference parses one soup per ``Page`` and interns nodes
(``/root/reference/mlscraper/html.py:189-207``).  Here parsing happens
*inside* an Arrow-batched ``mapInPandas`` — the DOM never crosses a
partition boundary; what comes out is the flat ``nodes`` table of SURVEY.md
§1.2 on which all match predicates are plain column expressions.

Scale notes: embarrassingly parallel, no shuffle; output is ~50-500 rows per
page and prunes well (every downstream consumer selects a column subset).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

NODES_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.StringType(), False),
        T.StructField("node_id", T.IntegerType(), False),
        T.StructField("parent_id", T.IntegerType(), False),
        T.StructField("ancestor_ids", T.ArrayType(T.IntegerType()), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("id_attr", T.StringType(), True),
        T.StructField("classes", T.ArrayType(T.StringType()), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("own_texts", T.ArrayType(T.StringType()), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("sibling_index", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        # P2 precompute (see dom/parser.NodeRec.text_anc_ids): lets the
        # match scan's ancestor branch run joinless
        T.StructField("text_anc_ids", T.ArrayType(T.IntegerType()), False),
    ]
)


def explode_pages(pages_df: DataFrame, page_id_col: str = "page_id",
                  html_col: str = "html") -> DataFrame:
    """Explode HTML pages into node records (one row per DOM element)."""

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the UDF so executors resolve the module themselves
        from mlscraper_spark.dom.parser import parse_html

        for pdf in batches:
            rows = []
            for page_id, html in zip(pdf[page_id_col], pdf[html_col]):
                for r in parse_html(html, text_ancestors=True):
                    rows.append(
                        (
                            page_id,
                            r.node_id,
                            r.parent_id,
                            r.ancestor_ids,
                            r.tag,
                            r.attrs.get("id"),
                            r.classes,
                            r.attrs,
                            r.own_texts,
                            r.text,
                            r.sibling_index,
                            r.depth,
                            r.text_anc_ids,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in NODES_SCHEMA.fields])

    return pages_df.select(page_id_col, html_col).mapInPandas(
        _explode, schema=NODES_SCHEMA
    )
