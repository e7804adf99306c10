from bids_spark.streaming.incremental import IncrementalIndexer  # noqa: F401
