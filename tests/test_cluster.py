"""ServingCluster: dispatch, worker-death re-queue, health, error caps."""
import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from chatterbox_tpu.runtime.cluster import ServingCluster


def test_cluster_dispatch_and_health(tmp_path):
    c = ServingCluster("cluster_helpers:make_fake", n_workers=2,
                       heartbeat_timeout_s=60, poll_s=0.02)
    try:
        res = c.synthesize_many([f"utterance {i}" for i in range(6)],
                                timeout_s=60)
        assert all(r.ok for r in res)
        assert all(len(r.wav) == 2400 for r in res)
        h = c.health()
        assert h["backlog"] == 0 and h["inflight"] == 0
        assert len(h["workers"]) == 2 and all(h["workers"].values())
    finally:
        c.shutdown()


def test_cluster_requeues_after_worker_death(tmp_path):
    flag = str(tmp_path / "crashed")
    c = ServingCluster("cluster_helpers:make_fake", n_workers=2,
                       factory_kwargs={"crash_flag": flag},
                       heartbeat_timeout_s=60, max_retries=2, poll_s=0.02)
    try:
        texts = ["ok one", "CRASH me", "ok two", "ok three"]
        res = c.synthesize_many(texts, timeout_s=120)
        assert all(r.ok for r in res), [r.error for r in res]
        assert os.path.exists(flag)            # a worker really died
    finally:
        c.shutdown()


def test_cluster_caps_poison_requests(tmp_path):
    c = ServingCluster("cluster_helpers:make_fake", n_workers=1,
                       heartbeat_timeout_s=60, max_retries=1, poll_s=0.02)
    try:
        res = c.synthesize_many(["fine", "RAISE now", "fine again"],
                                timeout_s=120)
        assert res[0].ok and res[2].ok
        assert not res[1].ok
        assert "synthetic synthesis failure" in res[1].error
    finally:
        c.shutdown()
