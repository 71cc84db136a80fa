"""Stateful streaming NEAR-dup detection over an append-only docs
stream — the banded-MinHash companion to dedup_stream's exact digests.

Policy (deterministic, first-seen-wins): every LSH band key remembers
its first-arriving document (ties within a micro-batch break on doc_id
ASC) as the band REPRESENTATIVE, including the rep's distinct shingle
set. Every later document whose text shares that band key is verified
with EXACT Jaccard against the representative and emitted as
(doc_id, dup_of=rep, jaccard); a document is a near-dup if ANY of its
bands verifies >= the caller's threshold. This is the streaming shape
of dedup.minhash_lsh_pairs with the canonical-keeper choice resolved
by arrival order instead of min-id — the policy real ingest pipelines
run, where the corpus is unbounded and re-pairing against all history
is impossible.

Scale shape: state is keyed on the md5 band key (uniform by
construction — no hot state partitions); state size = one shingle set
per DISTINCT band key (RocksDB state store on a real cluster); the
per-batch shuffle carries (band, doc_id, shingle-digest array) only.
Shingles are stored/compared as md5 digests: Jaccard over digests
equals Jaccard over raw shingles absent md5 collisions.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import text as T

OUT_SCHEMA = ("band string, doc_id bigint, dup_of bigint, "
              "jaccard double, is_rep boolean")
STATE_SCHEMA = "rep_id bigint, rep_sh string"


def _update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    band = key[0]
    rows = []
    for pdf in pdfs:
        for did, sh in zip(pdf["doc_id"], pdf["sh"]):
            rows.append((int(did), frozenset(sh)))
    if not rows:
        return
    rows.sort(key=lambda r: r[0])  # deterministic intra-batch order
    out = []
    if state.exists:
        rep_id, rep_cat = state.get
        rep_id, rep = int(rep_id), set(rep_cat.split(",")) if rep_cat else set()
    else:
        rep_id, rep = rows[0][0], set(rows[0][1])
        out.append((band, rep_id, rep_id, 1.0, True))
        rows = rows[1:]
        state.update((rep_id, ",".join(sorted(rep))))
    for did, sh in rows:
        union = len(sh | rep)
        j = (len(sh & rep) / union) if union else 0.0
        out.append((band, did, rep_id, round(j, 6), False))
    if out:
        yield pd.DataFrame(
            out, columns=["band", "doc_id", "dup_of", "jaccard", "is_rep"])


def neardup_stream(docs_stream: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", bands: int = 4,
                   rows_per_band: int = 4,
                   shingle_n: int = 3) -> DataFrame:
    """Transform an append-only docs stream into per-(band, doc)
    near-dup evidence rows vs the band's first-seen representative."""
    band_keys = [
        F.expr(T.band_key_expr(text_col, b, rows_per_band, shingle_n)[0])
        .alias(f"__b{b}") for b in range(bands)
    ]
    sh = F.expr(
        f"ARRAY_DISTINCT(TRANSFORM({T.shingles_expr(text_col, shingle_n)[0]},"
        f" x -> MD5(x)))")
    keyed = (
        docs_stream.select(F.col(id_col).cast("long").alias("doc_id"),
                           sh.alias("sh"), *band_keys)
        .selectExpr(
            "doc_id", "sh",
            "EXPLODE(ARRAY(" + ", ".join(f"__b{b}" for b in range(bands))
            + ")) AS band")
    )
    return (
        keyed.groupBy("band")
        .applyInPandasWithState(
            _update, OUT_SCHEMA, STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_neardup_stream(docs_stream: DataFrame, out_dir: str,
                         checkpoint_dir: str, **kwargs):
    """Run the near-dup stream to a parquet evidence log (availableNow)."""
    out = neardup_stream(docs_stream, **kwargs)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(out_dir)

    return (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
