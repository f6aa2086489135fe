"""bm25_pagerank_rpi_spark — a PySpark-native full-text retrieval engine.

A from-scratch rebuild of the capabilities of SeanIFitch/bm25-pagerank-rpi
(reference at /root/reference, cited as file:line in docstrings):

- inverted-index construction over multi-turn transcript tables
  (the reference outsources this to an HTTP index service,
  internal/ranking/data_getters.go:43-76 — we build it natively),
- BM25(k1=1.2, b=0.75) top-k scoring rank-identical to the reference
  (internal/ranking/features.go:118-139, ranker.go:44-68),
- the full 24-dimensional LTR feature vector (features.go:200-256),
- PageRank over a document graph (the reference fetches it from a service,
  data_getters.go:147-181 — we compute it as an iterative DataFrame job),
- LETOR parsing / pairwise example generation / logistic-regression
  training (internal/datagen, internal/training),
- plus large-scale pipeline extras: dedup, similarity search, text
  analysis, multimodal plumbing.

Everything is DataFrame-first: Catalyst plans the relational part; the
data plane (tokenize, posting-block codec, block-max WAND) lives behind
vectorized Arrow pandas UDFs. No per-row Python anywhere.
"""

K1: float = 1.2  # reference internal/ranking/types.go:11
B: float = 0.75  # reference internal/ranking/types.go:12
MAX_DOCUMENTS: int = 1000  # reference internal/ranking/types.go:8
EPSILON: float = 1e-12  # reference internal/ranking/types.go:15

__version__ = "0.1.0"
