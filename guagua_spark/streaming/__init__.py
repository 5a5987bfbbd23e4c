from guagua_spark.streaming.stream_ops import (  # noqa: F401
    run_available_now,
    streaming_click_purchase_join,
    streaming_decontaminate,
    streaming_dedup_docs,
    streaming_dedup_incremental,
    streaming_doc_chunks,
    streaming_rollup_maintenance,
    streaming_score,
    streaming_sessionize,
    streaming_stratified_sample,
    streaming_user_totals,
    streaming_windowed_counts,
)
