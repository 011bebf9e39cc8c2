"""Versioned file-backed shard state for the URL-seen filters.

Round 2 fixed the seen-filter's *traffic* (changed-shard-only shipping);
this module fixes the *residency*: the driver never holds a shard bitmap
or cuckoo table again. State lives as one immutable versioned file per
shard under a state directory (the engine points it inside the checkpoint
dir, so the SnapshotStore's durability story covers the filter too):

* ``{dir}/shard{s:05d}.v{v:06d}.bin`` — version v of shard s. Files are
  immutable once published: a writer stages to a ``.tmp`` path and
  ``os.replace``s it in (atomic on POSIX; on an object store the
  single-object PUT is the atomic publish — same contract).
* Mutation happens IN THE TASKS: the build job groups URLs by shard, and
  the one task that owns a shard group loads the current version, applies
  its delta, and publishes version v+1. The driver receives only tiny
  ``(shard, n, changed)`` accounting rows — O(n_shards) ints, never
  O(filter-state) bytes.
* Probes load shard files lazily on the WORKERS through a per-process
  cache keyed by (dir, shard): a version bump invalidates exactly that
  shard's entry, so an unchanged shard is read from disk once per worker
  process and served from memory afterwards — the file-backed equivalent
  of the round-2 changed-shard-only re-broadcast lifecycle.
* The previous version is kept for one generation (lazy cleanup of v-2 on
  publish) so lazily recomputed plans that captured version v-1 can still
  resolve; eagerly checkpointed engine plans never reach back further.

The driver keeps only the per-shard version vector plus counters, persisted
as ``_filter_manifest.json`` after every mutation — a resumed run reopens
the same state dir and skips the seen-set backfill.
"""

from __future__ import annotations

import json
import os
import threading

# Per worker process: (state_dir, shard) -> (version, parsed_payload).
# Keyed per shard (not per version) so a version bump evicts the stale
# entry and memory stays O(shards-this-worker-touched), never O(history).
_CACHE: dict[tuple[str, int], tuple[int, object]] = {}
_CACHE_LOCK = threading.Lock()


def shard_path(state_dir: str, shard: int, version: int) -> str:
    return os.path.join(state_dir, f"shard{shard:05d}.v{version:06d}.bin")


def publish_shard(state_dir: str, shard: int, version: int,
                  payload: bytes) -> None:
    """Atomically publish ``payload`` as the new version of ``shard`` and
    lazily drop version-2 (one generation of grace for lazy readers)."""
    final = shard_path(state_dir, shard, version)
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, final)
    if version >= 2:
        try:
            os.remove(shard_path(state_dir, shard, version - 2))
        except FileNotFoundError:
            pass


# Version tokens are ``epoch << 20 | version`` (ShardMeta.token): the low
# 20 bits count publishes within an epoch (1M rounds headroom), the high
# bits change on reset() so post-reset lookups can't hit stale cache/file
# entries. Low bits == 0 ⇔ the shard was never written in this epoch.
_VER_MASK = (1 << 20) - 1


def read_shard(state_dir: str, shard: int, version: int) -> bytes | None:
    """Raw bytes of a shard version token; None if never written (the
    version bits of the token are zero)."""
    if version & _VER_MASK == 0:
        return None
    with open(shard_path(state_dir, shard, version), "rb") as f:
        return f.read()


def cached_load(state_dir: str, shard: int, version: int, parse_fn):
    """Worker-side cached load: parse_fn(bytes|None) -> payload object.

    The parsed payload for the CURRENT version of each shard is memoized
    per process; older versions are evicted on sight. Entries for
    ABANDONED state dirs (deleted temp dirs from earlier filter instances
    in the same long-lived worker process — bench suites, repeated engine
    runs) are swept on insert: without the sweep every run strands
    n_shards parsed payloads (~1 MiB each at bloom defaults) per worker,
    growing without bound across runs. The sweep is O(cached dirs) stat
    calls per NEW (dir, shard) key only — cache hits never pay it.
    """
    key = (state_dir, shard)
    with _CACHE_LOCK:
        hit = _CACHE.get(key)
        if hit is not None and hit[0] == version:
            return hit[1]
    payload = parse_fn(read_shard(state_dir, shard, version))
    with _CACHE_LOCK:
        if key not in _CACHE:
            live = {d: os.path.isdir(d)
                    for d in {d for d, _ in _CACHE} | {state_dir}}
            if not all(live.values()):
                for k in [k for k in _CACHE if not live[k[0]]]:
                    del _CACHE[k]
        _CACHE[key] = (version, payload)
    return payload


class ShardMeta:
    """Driver-side metadata for a file-backed sharded filter: the version
    vector + counters. THIS is everything the driver holds — at FPR<1% and
    10^10 URLs the shard bitmaps total ~12 GiB, the version vector stays
    ``n_shards`` ints."""

    def __init__(self, state_dir: str, n_shards: int) -> None:
        self.state_dir = state_dir
        self.n_shards = n_shards
        self.versions = [0] * n_shards
        self.epoch = 0
        self.counters: dict = {}
        os.makedirs(state_dir, exist_ok=True)
        m = self._load_manifest()
        if m is not None and m.get("n_shards") == n_shards:
            self.versions = list(m["versions"])
            self.epoch = int(m.get("epoch", 0))
            self.counters = dict(m.get("counters", {}))

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "_filter_manifest.json")

    def _load_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def save(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": self.n_shards, "versions": self.versions,
                       "epoch": self.epoch, "counters": self.counters}, f)
        os.replace(tmp, self._manifest_path)

    def token(self, shard: int) -> int:
        """Cache/path token for a shard's current state: epoch ∥ version.

        Tokens are GLOBALLY unique across :meth:`reset` generations — a
        reset bumps the epoch, so a worker-process cache entry from the
        previous generation (same shard, version counter restarted) can
        never satisfy a post-reset lookup with stale bytes."""
        return (self.epoch << 20) | self.versions[shard]

    def tokens(self) -> tuple[int, ...]:
        return tuple(self.token(s) for s in range(self.n_shards))

    def reset(self) -> None:
        """Drop all shard state (a fresh run over a stale state dir) and
        start a new epoch so token-keyed worker caches can't serve the old
        generation."""
        for name in os.listdir(self.state_dir):
            if name.startswith("shard") and name.endswith(".bin"):
                os.remove(os.path.join(self.state_dir, name))
        self.epoch += 1
        self.versions = [0] * self.n_shards
        self.counters = {}
        self.save()

    def driver_resident_bytes(self) -> int:
        """Upper bound on driver-held filter state (the version vector) —
        the testable no-O(total-state)-on-the-driver claim."""
        return 8 * len(self.versions)
