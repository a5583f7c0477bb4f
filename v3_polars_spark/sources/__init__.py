from .connectors import Connector, LocalParquetConnector, rows_to_dataframe
from .ingest import (
    max_landed_block,
    ovm1_rewrite,
    update_table,
    update_tables,
)
from .pyds import SegmentSinkDataSource, WarehouseDataSource
from .warehouse import NFP_MANAGER, AlliumSource, BigQuerySource

__all__ = [
    "AlliumSource",
    "BigQuerySource",
    "Connector",
    "LocalParquetConnector",
    "NFP_MANAGER",
    "max_landed_block",
    "ovm1_rewrite",
    "rows_to_dataframe",
    "update_table",
    "update_tables",
    "SegmentSinkDataSource",
    "WarehouseDataSource",
]
