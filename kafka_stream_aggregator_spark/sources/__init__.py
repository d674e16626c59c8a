"""Custom batch data sources (Spark 4 Python DataSource API)."""

from .pydatasource import TradeGenDataSource, gen_row, register  # noqa: F401
