"""Generic JSON-LD column processing: any DataFrame column holding
JSON-LD document text → triples, via the kernel inside an Arrow-batched
pandas UDF. The schemaless counterpart of the fixed-shape transcript
pipeline — this is what "run jsonld.toRDF over a 100 TB table of JSON
documents" compiles to.

Demonstrated on events.props (tiny JSON objects): each event's props
document is expanded under a broadcast-style shared context with the
event IRI as @id, and the resulting quads are exploded to triple rows.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

EX = "http://example.org/props#"
EVT_NS = "http://example.org/event/"

TRIPLE_SCHEMA = StructType([
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj_value", StringType()),
    StructField("obj_termtype", StringType()),
    StructField("obj_datatype", StringType()),
    StructField("obj_language", StringType()),
    StructField("graph", StringType()),
])


def jsonld_column_to_triples(df, id_col: str, json_col: str,
                             context: dict, id_ns: str = "",
                             expansion_map=None):
    """(id, json_doc) columns → triple rows. The context is processed
    ONCE per Python worker (resolve-once pattern) and every document
    expands under it. `expansion_map` threads the kernel's per-event
    callback (ref lib/jsonld.js:109-117) into the schemaless path; it
    disables the IRI memo, so reserve it for event-level hooks."""
    ctx_items = tuple(sorted(context.items()))  # picklable closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        from ..kernel import to_rdf
        from ..kernel.context import initial_context, process_context
        opts0 = {"processingMode": "json-ld-1.1", "base": None}
        active = process_context(initial_context(opts0), dict(ctx_items),
                                 opts0)
        options = {"activeCtx": active, "skipCopy": True}
        if expansion_map is not None:
            options["expansionMap"] = expansion_map
        for pdf in batches:
            out = []
            for id_val, doc_text in zip(pdf["_id"], pdf["_doc"]):
                doc = _json.loads(doc_text)
                if isinstance(doc, dict) and "@id" not in doc:
                    doc["@id"] = f"{id_ns}{id_val}"
                out.extend(to_rdf(doc, options))
            yield pd.DataFrame(out, columns=TRIPLE_SCHEMA.fieldNames())

    src = df.select(F.col(id_col).cast("string").alias("_id"),
                    F.col(json_col).alias("_doc"))
    return src.mapInPandas(run, schema=TRIPLE_SCHEMA)


def q_jsonld_props_triples(spark, sf_dir):
    """events.props (JSON text) → triples under a shared @vocab
    context, subject = the event IRI."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (jsonld_column_to_triples(
        e, "event_id", "props", {"@vocab": EX}, id_ns=EVT_NS)
        .orderBy("subj", "pred", "obj_value"))


ORACLE_JSONLD_PROPS = f"""
SELECT '{EVT_NS}' || event_id AS subj,
       '{EX}k' AS pred,
       cast(cast(json_extract(props, '$.k') as bigint) as string)
         AS obj_value,
       'Literal' AS obj_termtype,
       'http://www.w3.org/2001/XMLSchema#integer' AS obj_datatype,
       cast(NULL as string) AS obj_language,
       '' AS graph
FROM events ORDER BY subj, pred, obj_value
"""

QUERIES = {"jsonld_props_triples": q_jsonld_props_triples}
ORACLES = {"jsonld_props_triples": ORACLE_JSONLD_PROPS}
