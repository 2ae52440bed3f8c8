"""diagon_spark — a PySpark-native inverted-index build + BM25 search engine.

A from-scratch rebuild of the capabilities of the reference C++ engine
(model-collapse/diagon): Lucene-style inverted index (tokenize → posting
lists with delta/bitpack/varint compression → segment merge → term
dictionary) and BM25 top-k search with Block-Max WAND pruning — expressed
Spark-first: DataFrame ops + vectorized Arrow/pandas UDFs, parquet-backed
index tables, shuffle-based sort-merge.

Public API (analogue of the reference C API, c_api/diagon_c_api.h:28-160):

    from diagon_spark import build_index, IndexCatalog, Searcher
    from diagon_spark.search.query import Term, Boolean, Phrase, MatchAll

    cat = build_index(spark, corpus_df, out_dir, num_segments=8)
    s = Searcher(spark, cat)
    top = s.search(Boolean(should=[Term("oil"), Term("price")]), k=100)
"""

from diagon_spark.index.builder import build_index, IndexCatalog
from diagon_spark.search.searcher import Searcher

__all__ = ["build_index", "IndexCatalog", "Searcher"]
__version__ = "0.1.0"
