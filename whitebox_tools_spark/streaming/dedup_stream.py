"""Stateful streaming exact-dedup over an append-only docs stream.

The batch `dedup.exact_dedup` keeps one representative per content
digest; the streaming form must remember every digest seen across
micro-batches. Plan: `applyInPandasWithState` keyed on the md5 digest —
state per digest is (first_id, dup_count); a batch's rows for an
already-seen digest emit nothing new, unseen digests emit their first
representative. Output stream = the new-representative rows per batch,
so `collect(stream) == exact_dedup(batch union)` minus later duplicate
counts (counts are also maintained in state and emitted as updates).

State scales with DISTINCT digests (RocksDB state store on a real
cluster); the shuffle key is the digest — uniformly distributed by
construction, no hot keys.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


OUT_SCHEMA = "digest string, doc_id bigint, dup_count bigint, is_new boolean"
STATE_SCHEMA = "first_id bigint, cnt bigint"


def _update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    digest = key[0]
    ids = []
    for pdf in pdfs:
        ids.extend(int(v) for v in pdf["doc_id"])
    if not ids:
        return
    batch_min = min(ids)
    batch_n = len(ids)
    if state.exists:
        first_id, cnt = state.get
        is_new = False
        first_id = min(int(first_id), batch_min)
        cnt = int(cnt) + batch_n
    else:
        is_new = True
        first_id, cnt = batch_min, batch_n
    state.update((first_id, cnt))
    yield pd.DataFrame({"digest": [digest], "doc_id": [first_id],
                        "dup_count": [cnt], "is_new": [is_new]})


def dedup_stream(docs_stream: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Transform an append-only docs stream into per-digest dedup
    updates: one row per (digest, batch) with the running first
    representative and duplicate count; is_new marks first sighting."""
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return (
        keyed.groupBy("digest")
        .applyInPandasWithState(
            _update, OUT_SCHEMA, STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_dedup_stream(docs_stream: DataFrame, out_dir: str,
                       checkpoint_dir: str, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Run the dedup stream to a parquet update log (availableNow)."""
    out = dedup_stream(docs_stream, text_col, id_col)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.withColumn("batch_id", F.lit(batch_id)) \
             .write.mode("append").parquet(out_dir)

    return (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
