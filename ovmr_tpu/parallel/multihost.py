"""Multi-host (one process per pod host) initialization.

A TPU pod runs one Python process per host; the jax program is GLOBAL
(one mesh over every chip in the slice) while each process feeds and
fetches only its addressable shards. The reference has no equivalent —
its only parallelism is single-process ``nn.DataParallel``
(``trainers/mm_classifier_one_prompt.py:414-419``).

Activation (before any jax computation):

- ``OVMR_COORDINATOR=host:port`` + ``OVMR_NUM_PROCESSES`` +
  ``OVMR_PROCESS_ID`` — explicit rendezvous (also how the 2-process CPU
  integration test runs, ``tests/test_multihost.py``);
- ``OVMR_MULTIHOST=1`` alone — TPU pod auto-detection
  (``jax.distributed.initialize()`` with no arguments).

After initialization, everything else is the existing code path: the
placement helpers in :mod:`ovmr_tpu.parallel.mesh` assemble global
arrays via ``make_array_from_callback`` and ``to_host`` gathers results,
under the contract that every process holds identical host values
(loaders seeded by ``cfg.SEED``, params by the same PRNGKey).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from OVMR_* env vars (no-op without
    them). Must run before the jax backend initializes."""
    import jax

    coord = os.environ.get("OVMR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["OVMR_NUM_PROCESSES"]),
            process_id=int(os.environ["OVMR_PROCESS_ID"]),
        )
        return True
    if os.environ.get("OVMR_MULTIHOST") == "1":
        jax.distributed.initialize()  # TPU pod auto-detection
        return True
    return False


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints/CSVs."""
    import jax

    return jax.process_index() == 0
