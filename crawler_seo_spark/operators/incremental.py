"""Incremental dedup against a PERSISTED signature index.

A 100 TB training-data pipeline does not deduplicate a frozen corpus once:
it ingests batches, and each batch must be checked against everything seen
so far without recomputing the corpus. The round-3 operators
(:func:`~crawler_seo_spark.operators.dedup.minhash_signatures` /
``lsh_candidate_pairs``) are whole-corpus one-shots; this module adds the
ingest shape:

* the MinHash signatures of every past document live in a provider table
  (:class:`~crawler_seo_spark.tables.SnapshotStore`), published per ingest
  round through Iceberg-style FAST-APPEND snapshots — each round writes
  ONLY the new batch's signatures (O(batch) IO) and the snapshot manifest
  unions it with the parent's data files. A full table rewrite per batch
  (``merge_into``'s shape, right for working-set-sized state like the
  frontier) would be O(corpus) per ingest — the scale-killer this design
  avoids.
* :meth:`SignatureIndex.ingest` computes signatures for the NEW batch
  only, emits LSH candidate pairs of new-vs-(index ∪ new) via the same
  banded equi-join as the full-corpus operator (the index side streams
  from parquet, the new side is broadcast — an ingest batch is small
  relative to the corpus), then publishes the appended snapshot. Pairs
  already emitted by earlier rounds (old×old) are never re-derived.

Invariant (pytest + the ``d_incremental_lsh_pairs`` DuckDB oracle): the
union of pairs over all ingest rounds equals the full-corpus
``lsh_candidate_pairs`` over the union of batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..tables import SnapshotStore
from .dedup import banded_keys, minhash_signatures


class SignatureIndex:
    """Persisted MinHash signature index for incremental LSH dedup.

    The driver holds only the store handle and the ingest-round counter —
    signatures live in the provider table, candidate generation is one
    banded equi-join per ingest.
    """

    def __init__(self, store: SnapshotStore, table: str = "signatures",
                 id_col: str = "doc_id", text_col: str = "text",
                 k: int = 32, bands: int = 8, shingle_n: int = 5,
                 shingle_mode: str = "char", hash_mode: str = "md5",
                 impl: str = "arrow", seed: int = 42,
                 broadcast_new: bool = True) -> None:
        assert k % bands == 0, "k must divide into equal bands"
        self.store = store
        self.table = table
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.shingle_n = shingle_n
        self.shingle_mode = shingle_mode
        self.hash_mode = hash_mode
        self.impl = impl
        self.seed = seed
        self.broadcast_new = broadcast_new

    def _signatures(self, docs: DataFrame) -> DataFrame:
        return minhash_signatures(
            docs, text_col=self.text_col, id_col=self.id_col, k=self.k,
            shingle_n=self.shingle_n, seed=self.seed,
            shingle_mode=self.shingle_mode, hash_mode=self.hash_mode,
            impl=self.impl)

    def committed_round(self) -> int | None:
        m = self.store.manifest()
        return None if m is None else m["round"]

    def signatures(self, spark: SparkSession) -> DataFrame | None:
        """The committed index (all ingested signatures), or None."""
        r = self.committed_round()
        return None if r is None else self.store.read(spark, self.table, r)

    def ingest(self, spark: SparkSession, new_docs: DataFrame,
               round_id: int | None = None) -> DataFrame:
        """Ingest a batch: returns candidate pairs of new-vs-(index ∪ new)
        and publishes the appended signature snapshot.

        Only ``new_docs``' signatures are computed (one pass, pinned by
        ``localCheckpoint`` so banding, the cross join, and the append
        write all share it — a rebase recomputes none of them); only they
        are written. Pair columns are canonical ``(id_a, id_b) = (least,
        greatest)`` longs, distinct across bands. Re-ingesting an id is
        the caller's contract to avoid (upstream URL-seen filtering
        guarantees it in the crawl pipeline); duplicate ids would pair
        with their earlier selves, surfacing — not corrupting — the
        violation.

        With a ``writer_id`` on the store, concurrent ingest writers
        cooperate: a writer that loses the commit race aborts its staged
        round and REBASES — re-deriving the cross pairs against the now
        larger committed index (so the winner's batch is paired against
        this one too) and re-appending onto the new parent. Without a
        writer_id the loser raises (single-writer contract).
        """
        from ..tables import ConcurrentCommitError

        obs = Observation()
        new_sigs = (self._signatures(new_docs)
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
        n_new = obs.get["n"]
        bn = banded_keys(new_sigs, self.bands, self.id_col, k=self.k)

        ln = bn.alias("l")
        # the ingest batch is small by contract (it is broadcast against
        # the index below) — broadcast one side of the new×new self-join
        # too, saving both of its shuffle exchanges
        rn = (F.broadcast(bn) if self.broadcast_new else bn).alias("r")
        pairs_new = (ln.join(rn, (F.col("l.band") == F.col("r.band"))
                             & (F.col("l.band_key") == F.col("r.band_key"))
                             & (F.col(f"l.{self.id_col}")
                                < F.col(f"r.{self.id_col}")))
                     .select(F.col(f"l.{self.id_col}").alias("id_a"),
                             F.col(f"r.{self.id_col}").alias("id_b")))

        last_conflict: int | None = None
        while True:
            prev_round = self.committed_round()
            rid = round_id if round_id is not None else (
                0 if prev_round is None else prev_round + 1)
            pairs = pairs_new
            if prev_round is not None:
                index = self.store.read(spark, self.table, prev_round)
                bi = banded_keys(index, self.bands, self.id_col, k=self.k)
                new_side = F.broadcast(bn) if self.broadcast_new else bn
                cross = (bi.alias("i")
                         .join(new_side.alias("n"),
                               (F.col("i.band") == F.col("n.band"))
                               & (F.col("i.band_key")
                                  == F.col("n.band_key")))
                         .filter(F.col(f"i.{self.id_col}")
                                 != F.col(f"n.{self.id_col}"))
                         .select(F.least(F.col(f"i.{self.id_col}"),
                                         F.col(f"n.{self.id_col}"))
                                 .alias("id_a"),
                                 F.greatest(F.col(f"i.{self.id_col}"),
                                            F.col(f"n.{self.id_col}"))
                                 .alias("id_b")))
                pairs = pairs.unionByName(cross)
            pairs = pairs.distinct()

            self.store.append(self.table, new_sigs, rid,
                              parent_round=prev_round)
            counters = {"n_new": int(n_new)}
            if prev_round is not None:
                prev_total = self.store.manifest()["counters"] \
                    .get("n_total", 0)
                counters["n_total"] = prev_total + int(n_new)
            else:
                counters["n_total"] = int(n_new)
            try:
                self.store.commit_round(rid, counters)
                return pairs
            except ConcurrentCommitError:
                if self.store.writer_id is None or round_id is not None:
                    raise  # single-writer contract / caller pinned the round
                if self.committed_round() == last_conflict:
                    raise  # marker holder made no progress: orphan, not peer
                last_conflict = self.committed_round()
                self.store.abort_round(rid)
