"""Timing + tracing instrumentation.

Upgrades the reference's ad-hoc `timer`/`timer_record` decorators
(`utils/utils.py:352-412`: CUDA-sync wall clock, rank-0 print, Excel rows) to
device-synchronized timers with structured records, plus a context manager
for JAX's native profiler (XLA trace for xprof/tensorboard).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import sys
import time
from typing import Dict, List, Optional

import jax

_RECORDS: List[Dict] = []


def _sync():
    # block until all device work is done (the CUDA-synchronize analogue)
    try:
        jax.block_until_ready(jax.device_put(0))
    except Exception:
        pass


def timer(fn=None, *, name: Optional[str] = None, record: bool = True):
    """Decorator: device-synchronized wall-clock timing; records to the
    in-process log and prints on process 0."""

    def wrap(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def inner(*args, **kwargs):
            _sync()
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            out = jax.block_until_ready(out) if _is_blockable(out) else out
            _sync()
            dt = time.perf_counter() - t0
            if record:
                _RECORDS.append({"name": label, "seconds": dt,
                                 "ts": time.time()})
            if jax.process_index() == 0:
                print(f"[timer] {label}: {dt:.3f}s", file=sys.stderr)
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


def _is_blockable(x) -> bool:
    try:
        leaves = jax.tree.leaves(x)
        return all(hasattr(l, "block_until_ready") or not callable(
            getattr(l, "block_until_ready", None)) for l in leaves)
    except Exception:
        return False


def records() -> List[Dict]:
    return list(_RECORDS)


def dump_records(path: str) -> None:
    """jsonl structured timing log (replaces the reference's Excel rows)."""
    with open(path, "w") as f:
        for r in _RECORDS:
            f.write(json.dumps(r) + "\n")


def reset_records() -> None:
    _RECORDS.clear()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace viewable in xprof/tensorboard."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dit_matmul_flops(cfg, num_tokens: int, text_len: int = None) -> float:
    """Analytic matmul+attention FLOPs of one Wan DiT forward at ``num_tokens``
    (batch 1). Used for measured-FLOP/s and MFU reporting in bench.py and
    the 14B probe."""
    L = num_tokens
    d, f = cfg.dim, cfg.ffn_dim
    Lt = text_len or cfg.text_len
    # self q/k/v/o (4 proj over L) + cross q/o over L and k/v over Lt + ffn.
    # NOTE recalibrated: an earlier revision double-counted the cross q/o
    # projections (+4Ld^2/block, inflating reported MFU ~3.7% at the 1.3B
    # and ~8.6% at the 14B 29.6k-token geometry).
    per_block = 2 * L * (4 * d * d) + 2 * (L + Lt) * d * d * 2 \
        + 2 * L * (2 * d * f)
    attn = 4 * L * L * d + 4 * L * Lt * d        # self + cross (qk + pv)
    pt, ph, pw = cfg.patch_size
    head = 2 * L * d * (pt * ph * pw * cfg.out_dim)
    embed = 2 * L * (cfg.in_dim * pt * ph * pw) * d
    return cfg.num_layers * (per_block + attn) + head + embed
