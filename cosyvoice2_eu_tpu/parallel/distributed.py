"""Multi-host initialization and synchronization.

TPU-native replacement for the reference's torch.distributed bring-up
(reference: cosy_repo/cosyvoice/utils/train_utils.py:45-56 init_distributed,
:269-287 cosyvoice_join monitored barrier, bin/train.py:505 gloo side group):
jax.distributed over DCN + host barriers via multihost_utils.  On a single
host this is a no-op, so the same training entry point runs everywhere.
"""

from __future__ import annotations

import logging
import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize multi-host jax; returns (process_index, process_count).

    Reads the standard JAX/TPU env when args are omitted (the moral
    equivalent of torchrun's env://; run.sh stage 5).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
        )
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize()  # TPU pod: auto-discovery
        except (ValueError, RuntimeError) as e:
            # single-host boxes sometimes carry pod-ish env vars without a
            # resolvable coordinator; degrade to single-process
            logging.info("jax.distributed auto-init unavailable (%s); single process", e)
    logging.info(
        "jax distributed: process %d / %d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index(), jax.process_count()


def host_barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's monitored gloo barrier; here a
    collective over all devices, which fails loudly on a lost host)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_from_host0(tree):
    """Replicate host-0's pytree everywhere (checkpoint resume fan-out)."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
