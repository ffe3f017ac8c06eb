from .loaders import TABLES, load_table
from .adapters import nodes_df, embeddings_df, edges_df
from .sinks import (
    save_state,
    load_state,
    nodes_from_csv,
    nodes_from_json,
    nodes_from_orc,
)

__all__ = [
    "TABLES",
    "load_table",
    "nodes_df",
    "embeddings_df",
    "edges_df",
    "save_state",
    "load_state",
    "nodes_from_csv",
    "nodes_from_json",
    "nodes_from_orc",
]
