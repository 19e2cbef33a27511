"""Multi-worker serving pool with failure detection and request re-queue.

The reference has no failure-handling story at all (SURVEY §5.3: local
try/except with degraded fallbacks, no health checks, no recovery).  For
multi-host TPU serving this module supplies the minimum production loop:

  * N worker processes, each owning a full TTS session (one per host /
    chip set — workers can pin different ``JAX_PLATFORMS`` / visible chips
    via the factory).
  * A dispatcher that assigns requests to idle workers, monitors worker
    liveness (process exit + heartbeat timeout), and **re-queues in-flight
    requests** of a dead worker onto the survivors.
  * Optional automatic worker restart with a capped retry budget per
    request (a request that kills two workers is returned as failed, not
    retried forever).

The worker factory is an importable path string ("pkg.module:fn") so the
spawned process builds its own model — JAX state never crosses the fork.
"""
from __future__ import annotations

import dataclasses
import importlib
import multiprocessing as mp
import queue as queue_mod
import threading
import time
import traceback
from typing import Any, Callable, Dict, List, Optional


@dataclasses.dataclass
class ClusterRequest:
    uid: Any
    text: str
    kwargs: dict = dataclasses.field(default_factory=dict)
    retries: int = 0


@dataclasses.dataclass
class ClusterResult:
    uid: Any
    wav: Optional[Any] = None            # np.ndarray on success
    error: Optional[str] = None
    worker: Optional[int] = None
    latency_s: float = 0.0

    @property
    def ok(self) -> bool:
        return self.error is None


def _resolve(path: str) -> Callable:
    mod, _, fn = path.partition(":")
    return getattr(importlib.import_module(mod), fn)


def _worker_main(wid: int, factory_path: str, factory_kwargs: dict,
                 task_q, result_q, hb, poll_s: float):
    """Worker process body: build the TTS once, then serve requests."""
    try:
        tts = _resolve(factory_path)(**factory_kwargs)
        result_q.put(("ready", wid, None, None))
    except Exception:
        result_q.put(("fatal", wid, None, traceback.format_exc()))
        return
    while True:
        hb.value = time.time()
        try:
            item = task_q.get(timeout=poll_s)
        except queue_mod.Empty:
            continue
        if item is None:                 # shutdown sentinel
            return
        req: ClusterRequest = item
        t0 = time.time()
        try:
            wavs = tts.generate([req.text], **req.kwargs)
            result_q.put(("done", wid, req.uid,
                          (wavs[0], time.time() - t0)))
        except SystemExit:
            raise
        except Exception:
            result_q.put(("error", wid, req.uid, traceback.format_exc()))


class ServingCluster:
    """Dispatcher over N TTS worker processes with liveness + re-queue."""

    def __init__(self, factory: str, n_workers: int = 2,
                 factory_kwargs: Optional[dict] = None,
                 heartbeat_timeout_s: float = 600.0,
                 max_retries: int = 1, restart_workers: bool = True,
                 poll_s: float = 0.1):
        self.factory = factory
        self.factory_kwargs = factory_kwargs or {}
        self.n_workers = n_workers
        self.heartbeat_timeout_s = heartbeat_timeout_s
        self.max_retries = max_retries
        self.restart_workers = restart_workers
        self.poll_s = poll_s

        self._ctx = mp.get_context("spawn")
        self._result_q = self._ctx.Queue()
        self._workers: Dict[int, dict] = {}
        self._next_wid = 0
        self._inflight: Dict[int, ClusterRequest] = {}   # wid -> request
        self._backlog: List[ClusterRequest] = []
        self._results: Dict[Any, ClusterResult] = {}
        self._lock = threading.Lock()
        for _ in range(n_workers):
            self._spawn_worker()

    # ------------------------------------------------------------------
    def _spawn_worker(self):
        wid = self._next_wid
        self._next_wid += 1
        task_q = self._ctx.Queue()
        hb = self._ctx.Value("d", time.time())
        proc = self._ctx.Process(
            target=_worker_main,
            args=(wid, self.factory, self.factory_kwargs, task_q,
                  self._result_q, hb, self.poll_s),
            daemon=True)
        proc.start()
        self._workers[wid] = dict(proc=proc, task_q=task_q, hb=hb,
                                  ready=False, busy=False)
        return wid

    def _dead(self, wid: int, w: dict) -> bool:
        if not w["proc"].is_alive():
            return True
        return (w["ready"] and
                time.time() - w["hb"].value > self.heartbeat_timeout_s)

    def _handle_death(self, wid: int):
        """Worker died: re-queue its in-flight request, optionally restart."""
        w = self._workers.pop(wid)
        if w["proc"].is_alive():
            w["proc"].terminate()
        req = self._inflight.pop(wid, None)
        if req is not None:
            req.retries += 1
            if req.retries > self.max_retries:
                self._results[req.uid] = ClusterResult(
                    uid=req.uid,
                    error=f"request failed {req.retries} workers "
                          f"(last: worker {wid} died)")
            else:
                self._backlog.insert(0, req)
        if self.restart_workers:
            self._spawn_worker()

    def _pump(self):
        """One dispatcher iteration: drain results, check liveness, assign."""
        try:
            while True:
                kind, wid, uid, payload = self._result_q.get_nowait()
                if kind == "ready":
                    if wid in self._workers:
                        self._workers[wid]["ready"] = True
                elif kind == "fatal":
                    # worker failed to build; surfaces on liveness check
                    pass
                elif kind == "done":
                    wav, dt = payload
                    self._results[uid] = ClusterResult(
                        uid=uid, wav=wav, worker=wid, latency_s=dt)
                    self._inflight.pop(wid, None)
                    if wid in self._workers:
                        self._workers[wid]["busy"] = False
                elif kind == "error":
                    req = self._inflight.pop(wid, None)
                    if wid in self._workers:
                        self._workers[wid]["busy"] = False
                    if req is not None:
                        req.retries += 1
                        if req.retries > self.max_retries:
                            self._results[req.uid] = ClusterResult(
                                uid=req.uid, error=payload, worker=wid)
                        else:
                            self._backlog.insert(0, req)
        except queue_mod.Empty:
            pass

        for wid in list(self._workers):
            if self._dead(wid, self._workers[wid]):
                self._handle_death(wid)

        for wid, w in self._workers.items():
            if not self._backlog:
                break
            if w["ready"] and not w["busy"]:
                req = self._backlog.pop(0)
                self._inflight[wid] = req
                w["busy"] = True
                w["task_q"].put(req)

    # ------------------------------------------------------------------
    def submit(self, uid: Any, text: str, **kwargs):
        with self._lock:
            self._backlog.append(ClusterRequest(uid=uid, text=text,
                                                kwargs=kwargs))

    def wait(self, uids: List[Any], timeout_s: float = 3600.0
             ) -> List[ClusterResult]:
        """Pump the dispatcher until every uid has a result (or timeout)."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            with self._lock:
                self._pump()
                if all(u in self._results for u in uids):
                    return [self._results[u] for u in uids]
            time.sleep(self.poll_s)
        raise TimeoutError(
            f"cluster.wait timed out; missing "
            f"{[u for u in uids if u not in self._results]}")

    def synthesize_many(self, texts: List[str], timeout_s: float = 3600.0,
                        **kwargs) -> List[ClusterResult]:
        uids = list(range(len(texts)))
        for u, t in zip(uids, texts):
            self.submit(u, t, **kwargs)
        return self.wait(uids, timeout_s)

    def health(self) -> dict:
        with self._lock:
            alive = {w: d["proc"].is_alive() for w, d in self._workers.items()}
            return dict(workers=alive,
                        ready=[w for w, d in self._workers.items()
                               if d["ready"]],
                        backlog=len(self._backlog),
                        inflight=len(self._inflight))

    def shutdown(self):
        with self._lock:
            for w in self._workers.values():
                try:
                    w["task_q"].put(None)
                except Exception:
                    pass
            for w in self._workers.values():
                w["proc"].join(timeout=5)
                if w["proc"].is_alive():
                    w["proc"].terminate()
            self._workers.clear()
