"""External-engine read integrations over the moonlink RPC scan protocol.

Parity: the reference embeds a DataFusion read integration
(``src/moonlink_datafusion``) whose ``TableProvider`` consumes the RPC
scan-result wire format; here the attached external engine is DuckDB
(one of the read engines the reference README names).
"""

from moonlink_spark.integrations.duckdb_provider import (  # noqa: F401
    attach_moonlink_table,
    live_rows_relation,
)
