"""neuroner_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference ``chieni/NeuroNER`` (see SURVEY.md).

This is NOT a port: the reference is a single-machine TF/numpy NLP
pipeline (batch-size-1 ``sess.run`` per sentence); this engine
re-expresses every data operation as declarative DataFrame transforms
so Catalyst/Tungsten own the physical plan, and confines the one
genuinely non-relational op (BiLSTM-CRF forward + Viterbi decode,
reference ``src/train.py :: prediction_step``) to a single
Arrow-batched ``mapInPandas`` stage.

Layout
------
- ``sources/``   scans: CoNLL, BRAT standoff, embedding text, pages
- ``functions/`` scalar/column functions: normalize, tokenize, tag
                 algebra (BIO<->BIOES), text analytics
- ``operators/`` relational operators: spans, vocab, metrics, dedup,
                 similarity, alignment joins, connected components,
                 linking, triples
- ``model/``     deterministic numpy BiLSTM-CRF + mapInPandas tagger
- ``plans/``     end-to-end pipeline with manifests/lineage/resume
- ``streaming/`` Structured Streaming ingestion (v2 extension)
- ``fixtures/``  deterministic synthetic test tables (FIXTURES.md)
"""

__version__ = "0.1.0"
