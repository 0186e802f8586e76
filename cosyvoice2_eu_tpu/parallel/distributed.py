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


def _all_hosts_agree_continue(has_next: bool) -> bool:
    """True iff EVERY host still has a batch.  A cheap per-step global
    collective replacing the reference's monitored gloo barrier
    (train_utils.py:269-287): instead of detecting a stall by timeout after
    a host ran out of data, hosts agree on continuation BEFORE dispatching
    the step, so the uneven-shard hang cannot form at all."""
    import jax

    if jax.process_count() == 1:
        return has_next
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(jnp.asarray(int(has_next)))
    return bool(flags.min() == 1)


def join_uneven_inputs(batch_iter, agree_fn=None, tag: str = "train"):
    """Wrap an epoch's batch iterator for multi-host safety: every host
    stops at the shortest host's shard (dropping at most a per-host tail),
    with a log line naming the uneven distribution (the reference's
    cosyvoice_join 'break current worker' semantics, executor.py:51)."""
    agree = agree_fn or _all_hosts_agree_continue
    it = iter(batch_iter)
    while True:
        try:
            batch = next(it)
            mine = True
        except StopIteration:
            batch, mine = None, False
        if not agree(mine):
            if mine:
                logging.warning(
                    "%s: uneven input shards — another host exhausted its "
                    "data; dropping this host's tail batch(es) to rejoin at "
                    "the epoch boundary", tag,
                )
            return
        yield batch


class StragglerGuard:
    """Watchdog for genuinely hung hosts (lost peer, wedged collective):
    logs a loud diagnostic if no step heartbeat arrives within `timeout_s`.

    The reference's monitored barrier turns a hang into a timeout error;
    under jax a wedged collective blocks inside the runtime with no Python
    exception, so detection has to come from the side.  Optional
    COSY_STRAGGLER_FATAL=1 turns detection into process exit so an external
    supervisor can restart the job.

        with StragglerGuard(timeout_s=600, tag="llm-train") as guard:
            for batch in batches:
                ...
                guard.beat(step)
    """

    def __init__(self, timeout_s: float = 600.0, tag: str = "train",
                 first_beat_grace_s: float = 3600.0):
        self.timeout_s = timeout_s
        self.tag = tag
        self.grace = first_beat_grace_s  # first step includes compiles
        self._last = None
        self._step = None
        self._stop = None
        self._thread = None

    def beat(self, step: int | None = None):
        import time

        self._last = time.monotonic()
        self._step = step

    def __enter__(self):
        import threading
        import time

        self._stop = threading.Event()
        start = time.monotonic()

        def watch():
            import faulthandler
            import sys

            while not self._stop.wait(min(self.timeout_s, 30.0) / 2):
                now = time.monotonic()
                if self._last is None:
                    if now - start < self.grace:
                        continue
                    waited = now - start
                else:
                    waited = now - self._last
                    if waited < self.timeout_s:
                        continue
                import jax

                logging.error(
                    "%s: NO step progress for %.0f s (last step=%s, process "
                    "%d/%d) — a peer host is likely lost or a collective is "
                    "wedged; dumping stacks", self.tag, waited, self._step,
                    jax.process_index(), jax.process_count(),
                )
                faulthandler.dump_traceback(file=sys.stderr)
                if os.environ.get("COSY_STRAGGLER_FATAL") == "1":
                    os._exit(42)
                self._last = time.monotonic()  # re-arm, keep logging
        import threading as _t

        self._thread = _t.Thread(target=watch, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False


def broadcast_from_host0(tree):
    """Replicate host-0's pytree everywhere (checkpoint resume fan-out)."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
