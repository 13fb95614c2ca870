from kgfarm_spark.sources.transcripts import (
    TRANSCRIPTS_SQL,
    PROBES_SQL,
    load_table,
    transcripts,
    probes,
    oracle_ctes,
)

__all__ = [
    "TRANSCRIPTS_SQL",
    "PROBES_SQL",
    "load_table",
    "transcripts",
    "probes",
    "oracle_ctes",
]
