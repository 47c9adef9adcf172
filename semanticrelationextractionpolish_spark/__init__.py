"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
hubertkarbowy/SemanticRelationExtractionPolish (reference, read-only at
/root/reference) as idiomatic PySpark DataFrame stages:

    pages (url, warc_ts, html, text, lang)
      -> extract    (html -> text, byte-identical per url)
      -> segment    (sentence split + subword tokenize)
      -> mentions   (inline-annotation scan -> IOB tags)
      -> pairs      (capped pairwise candidate generation + positional markers)
      -> score      (deterministic relation classification -> triples)
      -> linking    (lemma canonicalization, MinHash-LSH blocking,
                     connected components)
      -> materialize (nodes / edges, lineage + counters, checkpoint/resume)

All heavy per-sentence logic runs in Arrow-batched pandas UDFs
(`mapInPandas` / `applyInPandas`); all relational glue is plain DataFrame
operators optimized by Catalyst. No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
