"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL DDP / DeepSpeed ZeRO-2
(reference: cosy_repo/cosyvoice/utils/train_utils.py:45,100-152): a 2-D
('dp', 'fsdp') mesh where the batch shards over 'dp' (== DDP gradient
psum) and parameters + optimizer state shard over 'fsdp' (== ZeRO
optimizer-state partitioning).  Collectives ride ICI; multi-host extends the
'dp' axis over DCN via jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, fsdp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // fsdp
    assert dp * fsdp == n, f"dp({dp}) * fsdp({fsdp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def param_sharding_spec(leaf: jax.Array, fsdp: int) -> P:
    """ZeRO-style rule: shard the largest divisible axis over 'fsdp'."""
    if fsdp <= 1 or leaf.ndim == 0:
        return P()
    sizes = list(leaf.shape)
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    for ax in order:
        if sizes[ax] % fsdp == 0 and sizes[ax] >= fsdp:
            spec = [None] * len(sizes)
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per the fsdp rule."""
    fsdp = mesh.shape["fsdp"]

    def place(leaf):
        spec = param_sharding_spec(leaf, fsdp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over 'dp', replicate over 'fsdp'."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
