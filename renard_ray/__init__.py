"""renard_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine with the query/data-processing capabilities of the
CompNet/Renard reference (narrative relationship extraction), re-expressed
as streaming ``ray.data.Dataset`` pipelines of zero-copy Arrow batch
transforms over Parquet tables of Common-Crawl-style web pages.

Layout
------
- ``renard_ray.resources``  — gazetteers/lexicons (hypocorisms, titles,
  pronouns, determiners) broadcast per worker.
- ``renard_ray.textproc``   — pure-Python per-document kernels (tokenize,
  NER, quotes, sentiment, coref, unification, graph extraction).  These
  are shared verbatim between the distributed ``map_batches`` stages and
  the single-process golden oracle, so per-document semantics are
  identical by construction.
- ``renard_ray.stages``     — Ray Data stage wrappers (map_batches fns /
  actor-pool classes) with needs/produces schema validation.
- ``renard_ray.pipelines``  — end-to-end pipeline builders + sharded
  checkpoint/resume runner.
- ``renard_ray.sources``    — page synthesis + readers (parquet, CoNLL).
- ``renard_ray.ops``        — large-scale training-data operators
  (dedup families, similarity search, text stats, relational queries).
- ``renard_ray.oracle``     — golden single-process oracle + the triple
  P/R scorer (semantics of the reference's
  ``renard/pipeline/relation_extraction.py:64-93``).
"""

__version__ = "0.1.0"
