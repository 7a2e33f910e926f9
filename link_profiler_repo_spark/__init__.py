"""spark-frontier: a from-scratch PySpark-native URL frontier + fetch scheduler
with the data-processing capabilities of the Link_Profiler reference crawler.

The engine runs iterative BFS crawl epochs as DataFrame plans over tables of
interleaved text+media documents, maintains a partitioned SHA-256-keyed URL-seen
state table with Bloom prefilters, enforces politeness/robots via vectorized
pandas/Arrow UDFs, and feeds the link-graph analytics surface (link profiles,
velocity, intersect, domain scoring) plus training-data ops (dedup, similarity,
text analysis, multimodal plumbing).

Not a port: reference semantics are cited per-module as file:line pointers into
/root/reference (e.g. services/crawl_service.py:487-601 for the BFS loop).
"""

__version__ = "0.1.0"
