"""Graph sinks: partitioned Parquet (primary), GEXF export (small
aggregated graphs), networkx bridge."""
