"""jsonld_js_spark — a PySpark-native knowledge-graph construction engine
with the query/data-processing capabilities of jsonld.js (JSON-LD 1.1
processor), re-expressed Spark-first.

Layout (SURVEY.md §7):
- kernel/     pure-Python JSON-LD 1.1 core (oracle + UDF engine)
- sources/    transcript table derivation/synthesis, context loaders
- operators/  Spark stages: expand/node-map emit, salted merge, triple
              emission, dedup, similarity, text analysis
- plans/      end-to-end pipelines with checkpoint/lineage/resume
- functions/  column-level helpers (IRI algebra, canonical literals)
- streaming/  incremental triple construction over event streams
"""

__version__ = "0.1.0"
