"""Large-scale data-processing operators beyond the reference's NLP
chain: relational queries, dedup families, similarity search, text
analysis, multimodal plumbing.  All Ray-Data-native (``map_batches``
over Arrow, partial aggregation before shuffles, broadcast small
sides)."""
