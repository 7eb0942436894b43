"""Multi-worker serving and multi-host initialization.

The reference fans requests across `@ray.remote(num_gpus=1)` actors that each
own a full pipeline (`videox_fun/api/api_multi_nodes.py:75-98,262+`). JAX is
SPMD-native, so the equivalents are much thinner:

  * `init_distributed()` — `jax.distributed.initialize` wrapper for real
    multi-host TPU slices (process env: COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, or TPU metadata autodetection).
  * `WorkerPool` — fan a batch of requests over N HTTP workers (each a
    `serving.api` process pinned to its own chip/host), with round-robin
    dispatch and resume-safe retry. This is the serving-side analogue of the
    CLI's `pending[rank::world]` item sharding.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import urllib.request
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize JAX's multi-host runtime. On TPU pods with standard env this
    is fully automatic; explicit args override."""
    import jax
    kwargs = {}
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or
                                      os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(process_id if process_id is not None
                                   else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


@dataclass
class WorkerPool:
    """Round-robin request fan-out over serving.api workers."""

    endpoints: Sequence[str]          # e.g. ["http://host1:8188", ...]
    timeout: float = 900.0
    max_retries: int = 2

    def _post(self, endpoint: str, payload: Dict[str, Any]) -> Dict[str, Any]:
        from .api import ENDPOINT
        req = urllib.request.Request(
            endpoint.rstrip("/") + ENDPOINT,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.load(r)

    def healthy(self) -> List[str]:
        ok = []
        for ep in self.endpoints:
            try:
                with urllib.request.urlopen(ep.rstrip("/") + "/healthz",
                                            timeout=5) as r:
                    if json.load(r).get("status") == "ok":
                        ok.append(ep)
            except Exception:
                pass
        return ok

    def map(self, payloads: Sequence[Dict[str, Any]],
            num_threads: Optional[int] = None) -> List[Dict[str, Any]]:
        """Dispatch payloads over the workers; each worker serializes its own
        generations, the pool keeps every worker busy."""
        eps = list(self.endpoints)
        results: List[Optional[Dict]] = [None] * len(payloads)
        work: "queue.Queue" = queue.Queue()
        for i, p in enumerate(payloads):
            work.put(i)

        def run(worker_ep: str):
            while True:
                try:
                    i = work.get_nowait()
                except queue.Empty:
                    return
                last_err = None
                for _ in range(self.max_retries + 1):
                    try:
                        results[i] = self._post(worker_ep, payloads[i])
                        last_err = None
                        break
                    except Exception as e:  # retry on transient failure
                        last_err = e
                if last_err is not None:
                    results[i] = {"message": f"error: {last_err}"}

        threads = [threading.Thread(target=run, args=(ep,)) for ep in eps]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results  # type: ignore
