"""Continuous corpus curation: the batch curate pipeline as a
Structured Streaming sink — documents land as files, every micro-batch
is quality-filtered, PII-redacted, exact-deduped against everything
already accepted, and chunked for training.

Cross-batch dedup strategy: the accepted-corpus parquet IS the state.
Each batch anti-joins its content keys against the sink's key column —
exact across the whole stream with zero stream-state (surviving
restarts for free), at the cost of one column-pruned scan of the sink
keys per batch. That scan reads ONE 32-byte column; the bounded-state
in-stream alternative (streaming/dedup.dedup_stream_exact) trades
exactness past the watermark for no scan — both are provided, pick by
corpus size vs lateness needs.

Near-dup (MinHash) across the stream uses the INCREMENTAL SIGNATURE
STORE (operators/dedup.signature_store_append +
incremental_minhash_pairs): pass ``signature_store`` and every batch
is LSH-checked against the bucketed index of everything accepted so
far — the historical side never recomputes or re-shuffles — then the
batch's own survivors are appended to the index. Without a store,
near-dup remains a periodic batch compaction over the accepted corpus
(`operators/corpus.curate_pipeline`) — the standard lambda split.
Store appends after a mid-batch crash can duplicate (doc_id, bh) rows;
candidates are distinct-ed, so replayed appends cost work, not
correctness. Batch doc_ids that collide with an already-accepted id
are excluded and counted (`id_collisions` in progress) — the
incremental check verifies texts BY id, so an aliased id would verify
against the wrong document.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def start_curate_stream(
    spark: SparkSession,
    source_path: str,
    docs_path: str,
    chunks_path: str,
    checkpoint_path: str,
    trigger: dict | None = None,
    min_words: int = 20,
    min_quality: float = 0.5,
    lang: str = "en",
    redact: bool = True,
    chunk_tokens: int = 64,
    overlap: int = 8,
    max_files_per_trigger: int = 10,
    signature_store: str | None = None,
    neardup_threshold: float = 0.8,
    on_progress: Callable[[dict], None] | None = None,
):
    """Start the curation stream; returns the StreamingQuery.

    Per batch: train_filter → redact_pii → in-batch exact dedup →
    anti-join vs accepted corpus keys → [MinHash near-dup vs the
    signature store, when ``signature_store`` is set] → append accepted
    docs + their token chunks (+ the accepted docs' band buckets to the
    store). ``on_progress`` receives
    {batch_id, docs_in, kept, accepted, chunks, secs[, neardup_dropped,
    id_collisions]} per batch.
    """
    import os

    from hypermap_etl_spark.operators import dedup as _dedup
    from hypermap_etl_spark.operators.corpus import token_chunks, train_filter
    from hypermap_etl_spark.operators.curation import redact_pii

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _batch(df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        n_in = df.count()
        flt = train_filter(df, min_words=min_words, min_quality=min_quality, lang=lang)
        kept = df.join(flt.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
        if redact:
            kept = (
                kept.drop("text")
                .join(redact_pii(kept), "doc_id")
                .withColumnRenamed("redacted", "text")
            )
        keyed = kept.withColumn("__content_key", F.md5(F.col("text"))).dropDuplicates(
            ["__content_key"]
        )
        n_kept = keyed.count()
        if os.path.exists(docs_path):
            seen = spark.read.parquet(docs_path).select("__content_key")
            fresh = keyed.join(seen, "__content_key", "left_anti")
        else:
            fresh = keyed
        # localCheckpoint (NOT persist): appending to docs_path below
        # would invalidate any cached plan that still references that
        # path — the anti-join would then silently recompute against
        # the just-updated corpus and dedup this batch's own rows out
        # of the chunk write. Checkpointing truncates the lineage to
        # materialized blocks first. (Blocks are freed by the context
        # cleaner when the batch's reference drops.)
        fresh = fresh.localCheckpoint(eager=True)
        n_neardup = 0
        n_id_collisions = 0
        if signature_store is not None:
            corpus = (
                spark.read.parquet(docs_path).select("doc_id", "text")
                if os.path.exists(docs_path)
                else spark.createDataFrame([], "doc_id long, text string")
            )
            # enforce incremental_minhash_pairs' id-disjointness
            # precondition: a source that restarts its doc_id counter
            # would alias a historical id and verify against the WRONG
            # text. Colliding-id docs are excluded from this batch and
            # counted — surfacing the upstream id bug beats silently
            # mis-deduping on it.
            clash = fresh.join(corpus.select("doc_id"), "doc_id", "left_semi")
            n_id_collisions = clash.count()
            if n_id_collisions:
                fresh = fresh.join(
                    corpus.select("doc_id"), "doc_id", "left_anti"
                ).localCheckpoint(eager=True)
            store = (
                signature_store
                if spark.catalog.tableExists(signature_store)
                # first batch: empty index — the same code path still
                # drops in-batch near-dups
                else spark.createDataFrame([], "doc_id long, bh long")
            )
            # scope the pair-mining persists to THIS batch: the global
            # release_persisted() would also kill checkpoints other
            # computations in the shared session still reference
            from hypermap_etl_spark.util import persist_scope, tracked_persist

            with persist_scope():
                # signatures computed ONCE, shared by pair mining and
                # the store append (the two heaviest per-batch passes)
                sigs = tracked_persist(
                    _dedup.minhash_signatures(fresh.select("doc_id", "text"))
                )
                pairs = _dedup.incremental_minhash_pairs(
                    fresh.select("doc_id", "text"), corpus,
                    store, threshold=neardup_threshold, new_sigs=sigs,
                )
                # drop policy: near-dups of HISTORY always drop (the
                # accepted corpus cannot be retracted); within the
                # batch the min-id doc of each pair survives. NOTE this
                # is pairwise keep-first, not the batch compaction's
                # connected components: a chain new≈new'≈history keeps
                # `new` here, where a CC pass over the full graph would
                # drop it — run the periodic batch compaction when
                # chain-transitive dedup matters.
                drops = (
                    pairs.filter(F.col("src") == "store")
                    .select(F.col("doc_a").alias("doc_id"))
                    .unionByName(
                        pairs.filter(F.col("src") == "batch")
                        .select(F.col("doc_b").alias("doc_id"))
                    )
                    .distinct()
                )
                survivors = fresh.join(drops, "doc_id", "left_anti")
                survivors = survivors.localCheckpoint(eager=True)
                n_neardup = fresh.count() - survivors.count()
                fresh = survivors
                _dedup.signature_store_append(
                    fresh.select("doc_id", "text"),
                    signature_store,
                    sigs=sigs.join(
                        fresh.select("doc_id"), "doc_id", "left_semi"
                    ),
                )
        accepted = fresh.count()
        if accepted:
            fresh.write.mode("append").parquet(docs_path)
            chunks = token_chunks(fresh, chunk_tokens=chunk_tokens, overlap=overlap)
            chunks.write.mode("append").parquet(chunks_path)
            n_chunks = chunks.count()
        else:
            n_chunks = 0
        if on_progress is not None:
            on_progress(
                {
                    "batch_id": batch_id,
                    "docs_in": n_in,
                    "kept": n_kept,
                    "accepted": accepted,
                    "chunks": n_chunks,
                    "secs": round(time.monotonic() - t0, 3),
                    **(
                        {
                            "neardup_dropped": n_neardup,
                            "id_collisions": n_id_collisions,
                        }
                        if signature_store is not None
                        else {}
                    ),
                }
            )

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_path
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()


def start_media_dedup_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_path: str,
    store_table: str,
    max_hamming: int = 5,
    store_path: str | None = None,
    trigger: dict | None = None,
    on_progress: Callable[[dict], None] | None = None,
):
    """Continuous image near-dedup: media files land as MEDIA_SCHEMA
    parquet, every micro-batch is perceptually hashed (REAL pixel
    decode where the stdlib reaches — multimodal.image_ahash), checked
    against the bucketed ahash signature store of everything accepted
    so far (incremental_ahash_pairs: the historical side never rescans
    or re-shuffles, and verification is signature-local so no
    historical payload is ever read), and survivors are appended to
    ``out_path`` + the store. ``out_path`` is the curated media lake:
    it holds the survivors' FULL ``MEDIA_SCHEMA`` rows (payloads
    included), so downstream consumers read it directly without
    re-joining the source; signatures live only in ``store_table``
    (ADVICE r10 — the lake used to hold signature rows while the
    docstring promised media). Returns the StreamingQuery.

    Drop policy mirrors the text stream: near-dups of HISTORY always
    drop (the accepted lake cannot be retracted); within a batch the
    min-id image of each pair survives (pairwise, not
    connected-component — run a periodic batch compaction for
    chain-transitive dedup). UNDECODABLE payloads (no signature) are
    always accepted and never indexed — a NULL hash must not collide
    with anything. media_ids are assumed unique across the stream; an
    aliased id is skipped by the a!=b guard, so it hides a true dup
    rather than corrupting state. Store appends after a mid-batch
    crash can duplicate (media_id, ahash, bh) rows; candidates are
    distinct-ed, so replays cost work, not correctness.

    ``on_progress`` gets {batch_id, media_in, hashed, neardup_dropped,
    accepted, secs} per batch."""
    from hypermap_etl_spark.operators.multimodal import (
        ahash_store_append,
        image_ahash,
        incremental_ahash_pairs,
    )
    from hypermap_etl_spark.schemas import MEDIA_SCHEMA

    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(source_path)

    def _batch(df: DataFrame, batch_id: int) -> None:
        import os

        t0 = time.monotonic()
        n_in = df.count()
        # replay idempotence: a crash between the store append and the
        # streaming-checkpoint commit redelivers the batch, and each
        # already-accepted row would then meet its OWN store entry
        # (same media_id, skipped by the a != b guard) and be accepted
        # AGAIN — so anti-join against the accepted lake's ids first,
        # the same accepted-output-is-the-state move as the text
        # curate stream's content-key anti-join.
        if os.path.exists(out_path):
            seen = spark.read.parquet(out_path).select("media_id")
            df = df.join(seen, "media_id", "left_anti")
        hashes = image_ahash(df).localCheckpoint(eager=True)
        n_fresh = hashes.count()
        n_hashed = hashes.filter(F.col("ahash").isNotNull()).count()
        store = (
            store_table
            if spark.catalog.tableExists(store_table)
            else spark.createDataFrame(
                [], "media_id long, ahash long, bh long"
            )
        )
        pairs = incremental_ahash_pairs(hashes, store, max_hamming=max_hamming)
        drops = (
            pairs.filter(F.col("src") == "store")
            .select(F.col("media_a").alias("media_id"))
            .unionByName(
                pairs.filter(F.col("src") == "batch")
                .select(F.col("media_b").alias("media_id"))
            )
            .distinct()
        )
        survivors = hashes.join(drops, "media_id", "left_anti").localCheckpoint(
            eager=True
        )
        accepted = survivors.count()
        if accepted:
            # the lake gets the survivors' full media rows (payloads),
            # not their signature rows — semi-join back to the batch,
            # which is still in memory; signatures go to the store only
            df.join(
                survivors.select("media_id"), "media_id", "left_semi"
            ).write.mode("append").parquet(out_path)
            ahash_store_append(survivors, store_table, path=store_path)
        if on_progress is not None:
            on_progress(
                {
                    "batch_id": batch_id,
                    "media_in": n_in,
                    "replayed_skipped": n_in - n_fresh,
                    "hashed": n_hashed,
                    "neardup_dropped": n_fresh - accepted,
                    "accepted": accepted,
                    "secs": round(time.monotonic() - t0, 3),
                }
            )

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_path
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
