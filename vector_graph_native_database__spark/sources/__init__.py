from .loaders import TABLES, load_table
from .adapters import nodes_df, embeddings_df, edges_df

__all__ = ["TABLES", "load_table", "nodes_df", "embeddings_df", "edges_df"]
