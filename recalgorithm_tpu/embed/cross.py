"""Hashed cross features, computed on device from integer ids.

Replaces ``fc.crossed_column([userid, manual_tag_list], hash_bucket_size=100000)``
(reference wide_and_deep.py:121-124).  TF crosses the *strings* and buckets
them with FarmHash64; strings never reach a TPU in this framework, so we hash
the integer id pair with a splitmix64 finalizer instead.  Deviation note: the
bucket assignment is not bit-identical to TF's, but it is a deterministic
uniform hash of the same key pair, so collision statistics — and therefore the
wide part's learning behaviour — match.

The cross of a scalar field with a padded sequence field yields one bucket id
per sequence slot; PAD slots map to bucket id 0 which downstream lookups mask
out (same convention as embedding tables: id 0 = PAD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GOLDEN = jnp.uint32(0x9E3779B9)


def _mix32(x: jax.Array) -> jax.Array:
    """32-bit splitmix-style avalanche (uint32 in/out)."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hashed_cross(
    a_ids: jax.Array,
    b_ids: jax.Array,
    num_buckets: int,
) -> jax.Array:
    """Cross two id arrays into hash buckets in [1, num_buckets].

    Args:
      a_ids: (B,) scalar ids (0 = missing).
      b_ids: (B,) or (B, T) ids (0 = PAD/missing).
      num_buckets: hash bucket count (reference uses 100000).

    Returns:
      Same shape as ``b_ids``; PAD positions (either side 0) map to 0.
    """
    a = a_ids.astype(jnp.uint32)
    b = b_ids.astype(jnp.uint32)
    if b.ndim == a.ndim + 1:
        a = a[..., None]
    h = _mix32(a * _GOLDEN + _mix32(b))
    bucket = (h % jnp.uint32(num_buckets)).astype(jnp.int32) + 1
    valid = (a_ids if a_ids.ndim == b_ids.ndim else a_ids[..., None]) > 0
    valid = jnp.logical_and(valid, b_ids > 0)
    return jnp.where(valid, bucket, 0)
