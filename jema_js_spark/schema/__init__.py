from jema_js_spark.schema.frontend import (
    RefResolutionError,
    Schema,
    SchemaNotFound,
    SchemaRegistry,
)
from jema_js_spark.schema.sql_bridge import (
    layout_hints,
    schema_to_create_table,
    schema_to_ddl,
    struct_to_schema,
)
