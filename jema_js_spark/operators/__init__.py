from jema_js_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_candidates,
    ngram_jaccard,
    simhash_candidates,
)
from jema_js_spark.operators.drift import (
    categorical_drift,
    ks_exact,
    ks_two_sample,
    lang_drift_report,
)
from jema_js_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_cap,
)
from jema_js_spark.operators.referential import (
    fk_report,
    fk_violations,
    ts_window_violations,
)
from jema_js_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    fit_centroids,
    ivf_assign,
    ivf_topk,
)
from jema_js_spark.operators.stats import column_stats, column_stats_long
from jema_js_spark.operators.text import (
    lang_id_expr,
    quality_score,
    token_count,
    with_text_features,
)
from jema_js_spark.operators.uniqueness import duplicate_keys, uniqueness_report
