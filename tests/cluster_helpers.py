"""Importable worker factories for ServingCluster tests (spawned processes
re-import this module by path)."""
import os
import time

import numpy as np


class FakeClusterTTS:
    sr = 24000

    def __init__(self, crash_flag: str = ""):
        self.crash_flag = crash_flag

    def generate(self, prompts, **kw):
        out = []
        for p in prompts:
            if "CRASH" in p and self.crash_flag and \
                    not os.path.exists(self.crash_flag):
                open(self.crash_flag, "w").write("crashed once")
                os._exit(1)       # hard worker death mid-request
            if "RAISE" in p:
                raise ValueError("synthetic synthesis failure")
            time.sleep(0.02)
            out.append(np.full(2400, 0.1, np.float32))
        return out


def make_fake(crash_flag: str = ""):
    return FakeClusterTTS(crash_flag)
