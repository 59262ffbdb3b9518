from jema_js_spark.functions.columns import (
    canonical_json,
    js_length,
    js_multiple_of_col,
    js_rlike,
    js_rlike_is_jvm,
    js_round,
)
