"""PySpark-native hybrid vector+graph analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine (``/root/reference/app.py``): a property graph of text
nodes with typed weighted edges, hashed bag-of-words embeddings,
vector top-k search, BM25 keyword ranking, depth-limited weighted BFS
and weighted vector+graph hybrid ranking — plus the large-scale
training-data-pipeline operators (dedup, ANN similarity search, text
analysis, multimodal column plumbing) the reference lacks.

Everything is declarative DataFrame/SQL: no Python row-at-a-time UDFs
in any hot path, so Catalyst/Tungsten (predicate pushdown, column
pruning, broadcast joins, whole-stage codegen, AQE) apply end-to-end
and every operator scales by partitioning rather than driver memory.
"""

__version__ = "0.1.0"
