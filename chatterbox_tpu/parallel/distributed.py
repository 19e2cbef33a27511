"""Multi-host initialization (SURVEY §2.9 / §5.8: "jax.distributed init
across hosts, mesh over ICI/DCN").

The reference has no distributed path at all (vLLM's NCCL stack ships
unused, SURVEY §2.9); this is the TPU-native design: one controller process
per host calls :func:`init_distributed`, after which ``jax.devices()``
returns the GLOBAL device set and every jit over a multi-process mesh runs
SPMD — XLA lowers dp-axis collectives onto DCN and tp/sp collectives onto
ICI (build_mesh lays dp DCN-major).

Serving model (single-program multi-controller): every host runs the same
engine loop over the same request stream; per-host work divides through the
mesh's dp axis (KV lanes), while the tiny slot state is replicated so each
host can harvest/schedule identically without extra communication.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> dict:
    """Initialize jax.distributed from args or the CHATTERBOX_* /
    standard-cluster env (no-op when single-process: num_processes in
    {None on a non-cluster env, 1}).

    Env fallbacks: CHATTERBOX_COORDINATOR (host:port),
    CHATTERBOX_NUM_PROCESSES, CHATTERBOX_PROCESS_ID.  On GKE/GCE TPU pods
    jax.distributed.initialize() autodetects without args — pass nothing.

    Returns {"process_index", "process_count", "local_devices",
    "global_devices"} after initialization.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "CHATTERBOX_COORDINATOR")
    if num_processes is None and os.environ.get("CHATTERBOX_NUM_PROCESSES"):
        num_processes = int(os.environ["CHATTERBOX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CHATTERBOX_PROCESS_ID"):
        process_id = int(os.environ["CHATTERBOX_PROCESS_ID"])

    if (num_processes or 1) > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }
