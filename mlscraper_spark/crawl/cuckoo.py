"""P10 — partitioned cuckoo filter for the URL-seen fast path (new build).

One filter per ``host_bucket``, serialized as a numpy uint16 blob in the
``filters`` table.  Semantics: ``contains`` may return false positives but
never false negatives, so the engine uses it only to *split* candidates —
"definitely new" URLs skip the exact anti-join entirely; "maybe seen" URLs
go through the sort-merge anti-join against ``url_seen``, which remains the
ground truth (SURVEY.md §2.2 P10).  The per-bucket blob is snapshotted each
epoch with an md5 fingerprint in the manifest (lineage per north_rule).

Pure numpy, vectorizable inside applyInPandas; no per-row Python on lookup.
"""
from __future__ import annotations

import numpy as np

SLOTS_PER_BUCKET = 4
MAX_KICKS = 200
EMPTY = 0  # fingerprints are 1..65535; 0 marks an empty slot


class CuckooFilter:
    """``saturated`` is the no-false-negative guarantee under overflow: if
    an insert cannot complete, its kick chain is UNDONE (so nothing already
    present is evicted) and the filter degrades to answering "maybe seen"
    for everything — the exact anti-join backstop then carries the load;
    correctness never depends on filter capacity."""

    def __init__(self, n_buckets: int = 1 << 12, table: np.ndarray | None = None,
                 saturated: bool = False):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
        self.n_buckets = n_buckets
        self.saturated = saturated
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, SLOTS_PER_BUCKET), dtype=np.uint16)
        )

    # --- derivations from the 64-bit url_hash (signed, from xxhash64) -----
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> 48) & 0xFFFF).astype(np.uint16)
        fp[fp == EMPTY] = 1  # reserve 0 for empty
        return fp

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h & (self.n_buckets - 1)).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key cuckoo: i2 = i1 xor hash(fp)
        fph = (fp.astype(np.int64) * 0x5BD1E995) & (self.n_buckets - 1)
        return i1 ^ fph

    def insert_many(self, hashes) -> int:
        """Insert url_hashes (int64 array); returns number failed (filter
        full — callers fall back to the exact join, correctness unaffected).

        Vectorized fast path (this runs per host_bucket on EVERY epoch's
        fetched URLs): one membership precheck, then a bulk scatter into
        the primary buckets and another into the alternate buckets —
        slot = bucket_fill + rank-within-bucket computed from a stable
        argsort, so all writes of a round hit distinct (bucket, slot)
        pairs.  Only the rare both-buckets-full residue walks the per-item
        kick loop.  The result is a deterministic function of the input
        order (callers pass sorted hashes → blob bytes are a pure function
        of the hash set; fingerprints stay comparable across reruns and
        resume).  Occupied slots always form a per-bucket prefix (inserts
        only, kicks swap in place), so fill == first empty slot index."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64).astype(np.int64)
        if h.size == 0:
            return 0
        if self.saturated:
            # a saturated filter answers "maybe seen" for everything, so
            # further inserts cannot change any answer — skip them instead
            # of walking doomed kick chains (a saturated bucket otherwise
            # costs MAX_KICKS Python steps per failing hash: a measured
            # 88s/epoch kick storm at 1M-URL widths)
            return int(h.size)
        fps = self._fingerprint(h)
        i1s = self._index1(h)
        i2s = self._index2(i1s, fps)
        t = self.table
        # membership precheck (presence or same-fp collision — fine for a
        # filter; in-batch fp duplicates both land, harmless occupancy)
        fcol = fps[:, None]
        present = (t[i1s] == fcol).any(axis=1) | (t[i2s] == fcol).any(axis=1)
        rem = np.flatnonzero(~present)
        for buckets_of in (i1s, i2s):
            if rem.size == 0:
                break
            b = buckets_of[rem]
            order = np.argsort(b, kind="stable")
            bs, items = b[order], rem[order]
            fill = (t[bs] != EMPTY).sum(axis=1)
            first = np.r_[True, bs[1:] != bs[:-1]]
            run_starts = np.flatnonzero(first)
            rank = np.arange(len(bs)) - run_starts[np.cumsum(first) - 1]
            slot = fill + rank
            ok = slot < SLOTS_PER_BUCKET
            t[bs[ok], slot[ok]] = fps[items[ok]]
            rem = np.sort(items[~ok])
        failed = 0
        for item in rem.tolist():
            # kick loop, with an undo trail: on failure every displacement
            # is reverted so existing entries are never evicted
            cur_i, cur_fp = int(i1s[item]), int(fps[item])
            rng_state = cur_fp
            trail: list[tuple[int, int, int]] = []  # (bucket, slot, old_fp)
            for _ in range(MAX_KICKS):
                rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
                slot = rng_state % SLOTS_PER_BUCKET
                trail.append((cur_i, slot, int(t[cur_i][slot])))
                cur_fp, t[cur_i][slot] = int(t[cur_i][slot]), cur_fp
                cur_i = int(
                    self._index2(
                        np.array([cur_i]), np.array([cur_fp], dtype=np.uint16)
                    )[0]
                )
                empty = np.where(t[cur_i] == EMPTY)[0]
                if len(empty):
                    t[cur_i][empty[0]] = cur_fp
                    break
            else:
                for bkt, s, old in reversed(trail):
                    t[bkt][s] = old
                self.saturated = True
                # all remaining inserts are pointless now (see early exit)
                failed += 1 + int((rem > item).sum())
                break
        return failed

    def contains_many(self, hashes) -> np.ndarray:
        """Vectorized membership: bool array, True = maybe seen."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64).astype(np.int64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        if self.saturated:
            return np.ones(h.size, dtype=bool)  # degrade to exact-join path
        fps = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fps)
        fcol = fps[:, None]
        return ((self.table[i1] == fcol) | (self.table[i2] == fcol)).any(axis=1)

    # blob layout: b"CKF1" | uint32-LE n_buckets | saturated byte | table.
    # n_buckets travels IN the blob so a resumed crawl whose CrawlConfig
    # changed filter_buckets fails loudly with a config-mismatch message
    # instead of silently misreshaping the persisted table.
    _MAGIC = b"CKF1"

    def to_bytes(self) -> bytes:
        return (
            self._MAGIC
            + int(self.n_buckets).to_bytes(4, "little")
            + bytes([1 if self.saturated else 0])
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes, n_buckets: int | None = None) -> "CuckooFilter":
        if blob[:4] != cls._MAGIC:
            raise ValueError("not a CKF1 cuckoo-filter blob")
        stored = int.from_bytes(blob[4:8], "little")
        if n_buckets is not None and n_buckets != stored:
            raise ValueError(
                f"cuckoo filter config mismatch: snapshot was written with "
                f"filter_buckets={stored}, current CrawlConfig has "
                f"filter_buckets={n_buckets}; resume with the original value"
            )
        saturated = blob[8] == 1
        table = np.frombuffer(blob, dtype=np.uint16, offset=9).reshape(
            stored, SLOTS_PER_BUCKET
        ).copy()
        return cls(stored, table, saturated)
