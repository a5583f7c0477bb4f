from .connectors import Connector, LocalParquetConnector, rows_to_dataframe
from .ingest import (
    max_landed_block,
    ovm1_rewrite,
    update_table,
    update_tables,
)

__all__ = [
    "Connector",
    "LocalParquetConnector",
    "max_landed_block",
    "ovm1_rewrite",
    "rows_to_dataframe",
    "update_table",
    "update_tables",
]
