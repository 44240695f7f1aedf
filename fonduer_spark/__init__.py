"""fonduer_spark — a from-scratch, PySpark-native knowledge-base-construction engine.

Re-expresses the query/data-processing capabilities of HazyResearch/fonduer
(reference at /root/reference, studied for behavior only) as idiomatic Spark:

- parse:      HTML -> Context rows (documents/sections/tables/cells/figures/
              captions/paragraphs/sentences) via one ``mapInPandas`` stage
              (reference: parser/parser.py:168-857, a per-doc multiprocessing UDF).
- mentions:   ngram spaces x matcher algebra, fused per-sentence with
              longest-match-only pruning (reference: candidates/mentions.py,
              candidates/matchers.py).
- candidates: document-local cross product as a relational equi-join on url
              with throttler + self/nested/symmetric filters
              (reference: candidates/candidates.py:220-325).
- featurize:  textual/tabular/structural feature libraries as vectorized
              pandas UDFs (reference: features/).
- label:      labeling functions + label-model scoring (reference: supervision/).
- link:       minhash-LSH + connected-components canonicalization (new,
              mandated by the KG-construction north rule).
- triples:    (subj, pred, obj, prob, provenance) graph materialization.

Storage is snapshot-committed parquet (Iceberg-ready layout; no Iceberg jars
in this container), with per-stage checkpoint/lineage rows.
"""

__version__ = "0.1.0"
