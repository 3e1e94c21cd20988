from rdfrules_spark.streaming.ingest import (  # noqa: F401
    dedup_statements_stateful,
    finalize_store,
    finalize_store_ice,
    run_incremental_pipeline,
    run_incremental_pipeline_ice,
    stream_documents,
    stream_plain_documents,
    stream_statements,
    windowed_pred_counts,
)
