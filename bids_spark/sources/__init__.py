from bids_spark.sources.corpus import (  # noqa: F401
    load_documents,
    load_embeddings,
    synth_webpages,
    extract_text,
)
