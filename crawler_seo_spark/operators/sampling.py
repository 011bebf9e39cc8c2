"""Deterministic training-mix construction — sample each corpus stratum
(source, domain, language, …) at its own rate to hit a target mixture,
reproducibly.

The decision for a document is a pure function of ``(id, salt)``: keep
iff ``md5_32(id || ':' || salt) % 1_000_000 < rate_ppm(group)``. That
makes the sample

* **deterministic & versionable** — rerunning the job, on any cluster
  layout, selects the same documents; changing ``salt`` draws an
  independent sample;
* **monotone in rate** — raising a stratum's rate only ADDS documents
  (the kept set at 10% is a subset of the kept set at 20%), so mixture
  re-weighting between pipeline versions never churns the retained set;
* **cross-engine checkable** — md5-based, reproducible in the DuckDB
  oracle (xxhash64 would be engine-specific).

Scale shape: the weights table is one row per stratum — broadcast into
a hash join; the corpus never shuffles and the filter runs inside the
scan's codegen stage. Strata absent from the weights table are DROPPED
(an explicit mixture; a pass-through default would silently leak
unweighted sources into the mix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash32

_PPM = 1_000_000


def sample_decision_col(id_col: Column, rate_ppm: Column,
                        salt: str) -> Column:
    """True iff the (id, salt) hash falls under ``rate_ppm`` (parts per
    million)."""
    h = md5_hash32(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    return (h % _PPM) < rate_ppm


def sample_corpus_mix(df: DataFrame, weights: DataFrame,
                      group_col: str = "source",
                      id_col: str = "doc_id",
                      salt: str = "mix-v1") -> DataFrame:
    """Sample ``df`` per stratum: ``weights`` is ``(group_col, rate)``
    with rate in [0, 1]. Returns the sampled corpus (original columns).
    Rates are quantized to ppm — the same quantization the oracle
    applies."""
    w = weights.select(
        F.col(group_col),
        F.round(F.col("rate") * _PPM, 0).cast("long").alias("_ppm"))
    return (df.join(F.broadcast(w), group_col)
            .filter(sample_decision_col(F.col(id_col), F.col("_ppm"),
                                        salt))
            .drop("_ppm"))
