"""Session / DataContext tuning for the engine's workload shape."""

from __future__ import annotations

import logging
import os


def tune_data_context(target_max_block_size_mb: int = 128) -> None:
    """Apply the engine's DataContext defaults: bounded block size (one
    exploded tile batch x concurrency must fit worker heaps), no
    order preservation (outputs are keyed, order-independent), quiet
    logging.  Call after ray.init (any owner: CLI, bench, tests)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size_mb * 1024 * 1024
    ctx.execution_options.preserve_order = False
    ctx.execution_options.verbose_progress = False
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def init_local_ray(num_cpus: int | None = None) -> bool:
    """Session owner helper for CLI entry points ONLY (the driver and
    tests own their sessions; library code never calls this).

    Returns True when THIS call started the session -- callers must
    only ``ray.shutdown()`` if so: tearing down a session someone else
    owns (e.g. the pytest session cluster when a test drives ``main()``
    in-process) forces a mid-suite re-init whose teardown race can
    hard-kill the host process (the round-4 'second local cluster'
    gotcha, reproduced in-suite round 5)."""
    import ray

    if ray.is_initialized():
        tune_data_context()
        return False
    ray.init(
        address="local",
        num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    tune_data_context()
    return True
