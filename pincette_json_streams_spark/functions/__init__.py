from pincette_json_streams_spark.functions.caching import (  # noqa: F401
    release_caches,
)
