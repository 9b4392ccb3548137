"""Sources/sinks: testdata loaders, the transcript view, and the
Iceberg-or-Parquet table layer (state table for checkpoint/resume)."""

from matric_spark.sources.testdata import load_tables, register_views  # noqa: F401
from matric_spark.sources.transcripts_view import (  # noqa: F401
    TRANSCRIPT_VIEW_SQL,
    transcript_df,
)
