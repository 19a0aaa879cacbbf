"""KV slab pool + global prefix-KV LRU cache.

Parity: reference ``_KVPool`` (reference: /root/reference/mlx_parallm/utils.py:199-226)
and ``_GlobalPrefixCache`` (:231-287). TPU adaptations:

  * The pool keys on the full static slab shape. Decode steps donate the slab
    to XLA (in-place update), so a slab can only be recycled after its
    generation completes; the pool's main win is skipping the zeros init for
    hot shapes.
  * The prefix cache stores single-sequence device snapshots ``(k, v, length)``
    keyed by the exact prefix token tuple. Prefix lengths are bucketed down to
    multiples of 64 so the seeding slice shapes stay static (bounded XLA
    recompiles).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.base import KVCache

PREFIX_BUCKET = 64


class KVPool:
    """Reuse released KV slabs keyed by shape (zeroing instead of realloc)."""

    def __init__(self, max_per_key: int = 2):
        self._free: Dict[tuple, List[KVCache]] = {}
        self._lock = threading.Lock()
        self.max_per_key = max_per_key

    def acquire(
        self,
        num_layers: int,
        batch: int,
        capacity: int,
        heads: int,
        dim: int,
        dtype=jnp.bfloat16,
        kv_bits: int = 16,
    ):
        from ..models.base import QuantizedKVCache

        key = (num_layers, batch, capacity, heads, dim, str(dtype), kv_bits)
        with self._lock:
            stack = self._free.get(key)
            if stack:
                slab = stack.pop()
                return jax.tree_util.tree_map(jnp.zeros_like, slab)
        if kv_bits == 8:
            return QuantizedKVCache.init(num_layers, batch, capacity, heads, dim)
        return KVCache.init(num_layers, batch, capacity, heads, dim, dtype=dtype)

    def release(self, cache) -> None:
        if cache is None:
            return
        kv_bits = 8 if cache.k.dtype == jnp.int8 else 16
        dtype = jnp.bfloat16 if kv_bits == 8 else cache.k.dtype
        # Key mirrors acquire(): (L, B, capacity, heads, dim) — the slab
        # itself is laid out (L, B, H, S, D).
        key = (
            cache.k.shape[0],
            cache.k.shape[1],
            cache.k.shape[3],
            cache.k.shape[2],
            cache.k.shape[4],
            str(dtype),
            kv_bits,
        )
        with self._lock:
            stack = self._free.setdefault(key, [])
            if len(stack) < self.max_per_key:
                stack.append(cache)


class GlobalPrefixCache:
    """LRU of per-layer single-sequence KV snapshots keyed by prefix tokens.

    On a hit the snapshot is broadcast into every row of a fresh batch slab,
    skipping prefill of the shared prefix (reference utils.py:231-287)."""

    def __init__(self, capacity: int = 4, min_tokens: int = 64):
        self.capacity = capacity
        self.min_tokens = min_tokens
        self._d: "OrderedDict[tuple, dict]" = OrderedDict()
        # Miss counters: single-sequence prefixes are only snapshotted on
        # their SECOND sighting — a one-off prompt must not evict shared
        # prefixes from the (HBM-resident) LRU.
        self._miss_counts: "OrderedDict[tuple, int]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def bucket_len(n: int) -> int:
        return (n // PREFIX_BUCKET) * PREFIX_BUCKET

    def lookup(self, prefix_tokens: Tuple[int, ...]):
        """Returns a per-leaf snapshot dict (see ``snapshot_prefix``) or None."""
        key = tuple(prefix_tokens)
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                self.hits += 1
                return self._d[key]
            self.misses += 1
            self._miss_counts[key] = self._miss_counts.get(key, 0) + 1
            self._miss_counts.move_to_end(key)
            while len(self._miss_counts) > 64:
                self._miss_counts.popitem(last=False)
            return None

    def should_store(self, prefix_tokens: Tuple[int, ...], batch: int) -> bool:
        """Shared (batch > 1) prefixes are always worth a snapshot; a
        single-sequence prefix only after it has missed twice (i.e. the
        prompt repeats)."""
        if len(prefix_tokens) < self.min_tokens:
            return False
        if batch > 1:
            return True
        with self._lock:
            return self._miss_counts.get(tuple(prefix_tokens), 0) >= 2

    def store(self, prefix_tokens: Tuple[int, ...], snapshot: dict) -> None:
        if len(prefix_tokens) < self.min_tokens:
            return
        key = tuple(prefix_tokens)
        with self._lock:
            self._d[key] = snapshot
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()


def seed_cache_with_prefix(cache, snapshot: dict, length: int):
    """Broadcast per-leaf (L, 1, H, P, ...) snapshots into every row of a
    batch slab and set all row lengths to ``length``. Works for both float
    and int8-quantized caches (snapshot holds whatever leaves the cache type
    has, except ``lengths``; the position axis is 3 in the (L, B, H, S[, D])
    slab layout)."""
    import dataclasses as _dc

    b = cache.batch_size
    updates = {}
    for name, snap in snapshot.items():
        buf = getattr(cache, name)
        updates[name] = buf.at[:, :, :, :length].set(
            jnp.broadcast_to(
                snap, (snap.shape[0], b, snap.shape[2], length, *snap.shape[4:])
            )
        )
    updates["lengths"] = jnp.full_like(cache.lengths, length)
    return _dc.replace(cache, **updates)


def snapshot_prefix(cache, length: int) -> dict:
    """Row-0 per-leaf snapshots of the first ``length`` positions."""
    import dataclasses as _dc

    out = {}
    for field in _dc.fields(cache):
        if field.name == "lengths":
            continue
        buf = getattr(cache, field.name)
        out[field.name] = jnp.array(buf[:, 0:1, :, :length])
    return out


def common_prefix_length(rows: List[List[int]]) -> int:
    """Longest common prefix across token rows (reference utils.py:1206-1221)."""
    if not rows:
        return 0
    lcp = min(len(r) for r in rows)
    first = rows[0]
    for r in rows[1:]:
        i = 0
        while i < lcp and r[i] == first[i]:
            i += 1
        lcp = min(lcp, i)
        if lcp == 0:
            return 0
    return lcp


# --------------------------------------------------------------- hot window


def hot_bucket(need: int, capacity: int) -> int:
    """Geometric (doubling) KV hot-window bucket: bounds jit variants to
    log2(capacity/256) while keeping attention reads proportional to the
    longest live sequence instead of the slab capacity."""
    s = 256
    while s < need:
        s *= 2
    return min(s, capacity)


def slice_cache(cache, s_hot: int):
    """View of the first ``s_hot`` KV positions (position axis 3 of every
    slab field in the (L, B, H, S[, D]) layout)."""
    import dataclasses

    updates = {}
    for f in dataclasses.fields(cache):
        if f.name == "lengths":
            continue
        updates[f.name] = getattr(cache, f.name)[:, :, :, :s_hot]
    return dataclasses.replace(cache, **updates)


def merge_cache(full, working, s_hot: int):
    """Write the hot window back into the full slab."""
    import dataclasses

    updates = {"lengths": working.lengths}
    for f in dataclasses.fields(full):
        if f.name == "lengths":
            continue
        updates[f.name] = (
            getattr(full, f.name).at[:, :, :, :s_hot].set(
                getattr(working, f.name)
            )
        )
    return dataclasses.replace(full, **updates)
