"""Multi-host / SLURM distributed initialization.

Capability parity with the reference's distributed plumbing (reference
tactile_ssl/utils/__init__.py:12-22 SLURM rank discovery + Fabric DDP launch,
trainer.py:101-108): on TPU pods this is ``jax.distributed.initialize`` (one
process per host, devices global afterwards) with SLURM/OMPI env-var
auto-detection; single-host runs are a no-op. Preemption auto-requeue
(signal_connector.py:47-120) is handled by the Trainer's SIGTERM/SIGUSR1
last.ckpt save plus :func:`slurm_requeue` below.
"""
from __future__ import annotations

import os
import subprocess


def get_local_rank() -> int:
    """SLURM/OMPI-aware rank discovery (reference utils/__init__.py:12-22)."""
    for var in ("SLURM_PROCID", "OMPI_COMM_WORLD_RANK", "RANK"):
        if var in os.environ:
            return int(os.environ[var])
    return 0


def get_world_size() -> int:
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE"):
        if var in os.environ:
            return int(os.environ[var])
    return 1


def initialize_distributed(coordinator_address: str | None = None) -> bool:
    """Initialize JAX multi-process (multi-host TPU pod / multi-node CPU).

    Returns True if distributed mode was initialized. No-op (False) for
    single-process runs — mirroring the reference's dist.is_initialized()
    guards degrading to single-node."""
    import jax

    world = get_world_size()
    if world <= 1:
        return False
    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=world,
            process_id=get_local_rank(),
        )
    jax.distributed.initialize(**kwargs)
    return True


def is_main_process() -> bool:
    return get_local_rank() == 0


def slurm_requeue() -> bool:
    """Requeue the current SLURM job (reference signal_connector.py:76-100).
    Call after the Trainer's preemption checkpoint save."""
    job_id = os.environ.get("SLURM_JOB_ID")
    if not job_id:
        return False
    try:
        subprocess.run(["scontrol", "requeue", job_id], check=True)
        return True
    except Exception:
        return False
