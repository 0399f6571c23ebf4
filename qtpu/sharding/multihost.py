"""Multi-host pod-slice entry (SURVEY §5.8).

On a TPU pod slice each host runs the same program;
`initialize_multihost()` wires them into one JAX runtime (the role NCCL
bootstrap + torch.distributed.init_process_group would play on GPUs), after
which `make_mesh` spans all hosts' devices and GSPMD collectives ride
ICI within a slice / DCN across slices. Single-host (and this container)
is a no-op.
"""

from __future__ import annotations

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed when running under a multi-host launcher.

    With no arguments, relies on TPU metadata autodetection (GKE/TPU VM);
    explicit arguments support custom launchers. Returns a summary dict.
    """
    already = jax.process_count() > 1
    if not already and (
        coordinator_address is not None or num_processes not in (None, 1)
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the host that should write results/checkpoints."""
    return jax.process_index() == 0
