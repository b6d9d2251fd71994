"""Framing as distributed filter + join over the triple table.

The reference's frame engine (ref lib/frame.js:488-636 _filterSubject,
:76-323 embed) is a per-document recursive matcher. Over a 10^12-turn
KG the node map IS the triple table, so a frame compiles to:

- each property pattern → a semi-join on (pred, obj) — or an
  exists-join for wildcards,
- requireAll:true → AND of matches (successive semi-joins),
  requireAll:false → OR (union + distinct),
- @reverse patterns → the same join with subj/obj swapped
  (ref lib/frame.js:299-315 scans all subjects; here it is just the
  edge table read in the other direction),
- embedding (@embed:@once, depth 1) → join matched subjects' property
  rows plus one hop of referenced node property rows.

This covers the filter core of framing; list reconstruction and
@default fill remain kernel-path features (per-document, via
kernel.api on compacted output).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vocab import RDF_TYPE

WILDCARD = {}  # frame value {} = "property must exist" (ref frame.js:566)


def _match_subjects(triples: DataFrame, pred: str, value) -> DataFrame:
    """Subjects matching a single property pattern → 1-col DF 'subj'."""
    t = triples.filter(F.col("pred") == pred)
    if value is WILDCARD or value == {}:
        return t.select("subj").distinct()
    if isinstance(value, dict) and "@id" in value:
        return (t.filter((F.col("obj_termtype").isin("NamedNode",
                                                     "BlankNode")) &
                         (F.col("obj_value") == value["@id"]))
                .select("subj").distinct())
    # literal value pattern (match on lexical form)
    return (t.filter((F.col("obj_termtype") == "Literal") &
                     (F.col("obj_value") == str(value)))
            .select("subj").distinct())


def frame_subjects(triples: DataFrame, frame: dict,
                   require_all: bool = True) -> DataFrame:
    """Compile a (flat) frame pattern to the set of matching subjects.

    Supported keys: '@type' (IRI string), predicate IRIs with value
    patterns ({} wildcard / {'@id': iri} / scalar), '@reverse':
    {pred: {'@id': iri}}.
    """
    parts: list[DataFrame] = []
    for key, value in frame.items():
        if key == "@type":
            parts.append(_match_subjects(triples, RDF_TYPE,
                                         {"@id": value}))
        elif key == "@reverse":
            for pred, vpat in value.items():
                # invert the edge table (node↔object swap); only
                # node-valued objects are edges
                rev = (triples
                       .filter(F.col("obj_termtype")
                               .isin("NamedNode", "BlankNode"))
                       .select(F.col("obj_value").alias("subj"),
                               F.col("pred"),
                               F.col("subj").alias("obj_value"),
                               F.lit("NamedNode").alias("obj_termtype")))
                parts.append(_match_subjects(rev, pred, vpat))
        else:
            parts.append(_match_subjects(triples, key, value))
    if not parts:
        return triples.select("subj").distinct()
    out = parts[0]
    for p in parts[1:]:
        if require_all:
            out = out.join(p, "subj", "left_semi")
        else:
            out = out.unionAll(p)
    return out.distinct()


def frame_embed(triples: DataFrame, subjects: DataFrame,
                depth: int = 1) -> DataFrame:
    """@embed:@once to `depth` hops: property rows of the matched
    subjects plus rows of nodes they reference. Returns triple rows
    tagged with embed_depth (0 = matched subject itself)."""
    out = triples.join(subjects, "subj", "left_semi") \
        .withColumn("embed_depth", F.lit(0))
    frontier = subjects
    for d in range(1, depth + 1):
        refs = (triples.join(frontier, "subj", "left_semi")
                .filter(F.col("obj_termtype").isin("NamedNode", "BlankNode"))
                .select(F.col("obj_value").alias("subj")).distinct())
        hop = triples.join(refs, "subj", "left_semi") \
            .withColumn("embed_depth", F.lit(d))
        out = out.unionAll(hop)
        frontier = refs
    return out.dropDuplicates(
        ["subj", "pred", "obj_value", "obj_termtype", "obj_datatype",
         "obj_language", "graph"])
