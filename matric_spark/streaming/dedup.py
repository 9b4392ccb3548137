"""Streaming first-arrival dedup over a document/turn stream.

Deliberately built from Spark's NATIVE streaming dedup operator rather
than custom `applyInPandasWithState` state: `dropDuplicatesWithinWatermark`
keyed on the 60-bit content fingerprint gives exactly-once first-arrival
semantics with WATERMARK-BOUNDED state — each fingerprint is held only
until the event-time watermark passes its last-seen time + delay, so
state size tracks the duplicate-arrival window, not corpus history.

That bound is the honest scale contract: an unbounded streaming exact
dedup (every fingerprint ever seen, forever) is a key-value-store
problem, not a stream-operator problem — at 10^12 turns the state would
BE the corpus index. The engine therefore splits the job the way
production pipelines do:

- within-window dups (retries, crawler echoes, fan-in races):
  `stream_dedup` here, built-in operator, bounded state;
- cross-corpus/global dups: the batch operators
  (operators/dedup.exact_dedup, minhash_lsh_pairs_against) run on the
  accumulated table, where the full-history join is a shuffle, not
  resident state.

Reference lineage: matric's `distinct`-before-fanout discipline
(R/sim_calculate.R:293-299) re-targeted to arrival streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from matric_spark.functions.hashing import md5_long
from matric_spark.operators.dedup import normalized_text


def stream_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First arrival per content fingerprint within the watermark window.

    Input: a streaming DataFrame with an event-time column `ts_col` and
    a text column. Output: the input rows minus later duplicates, plus
    the `content_fp` column (the same normalize→md5_long fingerprint the
    batch operators key on, so stream output joins cleanly against batch
    dedup state). Duplicates arriving within `watermark` of each other
    are guaranteed dropped; older re-arrivals are the batch layer's job.
    """
    return (
        docs.withColumn("content_fp", md5_long(normalized_text(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_fp"])
    )
