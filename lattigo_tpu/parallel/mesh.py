"""Device-mesh construction and sharding helpers.

The framework's parallel axes (SURVEY.md section 5):

* ``party`` — threshold-protocol parties (dbfv/dckks).  Share aggregation is
  an associative modular sum; on two-plane uint32 residues a raw ``psum``
  would drop carries, so aggregation = ``all_gather`` over the party axis +
  a local modular tree fold (see :func:`aggregate_mod`).
* ``data`` — independent ciphertexts (the reference's goroutine-per-
  ciphertext parallelism, examples/dbfv/pir/pir.go:293-331, mapped onto
  devices instead of threads).
* limb axis (RNS residues) — sharded inside a ciphertext for very large
  parameter sets; embarrassingly parallel for every coefficient-wise op.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


def make_mesh(n_devices: int | None = None, party: int | None = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices with axes (party, data)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if party is None:
        party = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(devs.reshape(party, n // party), ("party", "data"))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with the batch dim sharded."""
    spec = P(axis)
    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        ),
        x,
    )


def aggregate_mod(ring, share, axis: str = "party"):
    """Modular all-reduce of per-party residue shares inside shard_map:
    all_gather over the party axis, then a local mod-q fold.

    This is the TPU-native replacement for the reference's
    ``AggregateShares`` adds (e.g. dbfv/keyswitching.go:115-118); gathering
    then folding keeps 64-bit carries exact on the uint32 planes.
    """
    lo = jax.lax.all_gather(share[0], axis)  # [P, ...]
    hi = jax.lax.all_gather(share[1], axis)
    n_party = lo.shape[0]
    acc = (lo[0], hi[0])
    for p in range(1, n_party):
        acc = ring.add(acc, (lo[p], hi[p]))
    return acc
