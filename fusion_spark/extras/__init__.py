"""Large-scale training-data pipeline operators beyond the reference's own
surface: deduplication, similarity search, text analysis, multimodal plumbing.
All Spark-first; Python appears only in Arrow-vectorized UDFs.
"""
