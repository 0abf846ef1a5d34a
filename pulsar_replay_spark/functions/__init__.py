from pulsar_replay_spark.functions.codecs import (  # noqa: F401
    PARTITION_SUFFIX_RE,
    collapse_partition,
    extract_project_id,
    is_partition_topic,
    topic_from_filename,
    topic_to_filename,
)
