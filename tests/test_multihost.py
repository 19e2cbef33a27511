"""Multi-host (multi-process SPMD) dry run as a test: 2 jax.distributed
processes x 2 virtual CPU devices each, sharded train step + sharded
serving engine with greedy parity (tools/dryrun_multihost.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_two_process_spmd():
    from dryrun_multihost import launch
    launch(num_processes=2, n_local=2, timeout_s=600)
