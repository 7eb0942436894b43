"""Device->host transport health probe.

The axon remote-TPU tunnel's fetch bandwidth swings 0.2-32 MB/s across
sessions while a locally attached chip moves GB/s; the decode stage's one
~40 MB uint8 readback is therefore anywhere between negligible and the
dominant cost. This module measures the real rate ONCE per process (a small
incompressible random-uint8 fetch from a warm executable — constant buffers
compress on the wire and report absurd bandwidth) so callers can adapt:
the pipeline auto-selects the half-size I420 fetch below
``YUV_AUTO_THRESHOLD_MBPS`` (see `wan_pipeline._decode_outputs`), and
bench.py reports the number next to the headline.
"""

from __future__ import annotations

import os
import time
from typing import Optional

_CACHE: dict = {}

# below this measured device->host rate the 2x-smaller I420 fetch wins even
# after the chroma-subsample pack/unpack cost (A/B on the slow tunnel:
# decode 8.4 s -> ~5 s at ~12 MB/s; on >20 MB/s links the pack overhead and
# chroma loss aren't worth it)
YUV_AUTO_THRESHOLD_MBPS = 20.0


def measured_fetch_mbps(sample_mb: int = 4, refresh: bool = False) -> float:
    """Measured device->host bandwidth in MB/s (cached per process).

    Non-TPU platforms return +inf (local host memory: never adapt)."""
    if "mbps" in _CACHE and not refresh:
        return _CACHE["mbps"]
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.devices()[0].platform != "tpu":
        _CACHE["mbps"] = float("inf")
        return _CACHE["mbps"]
    n = sample_mb * (1 << 20)
    fn = jax.jit(lambda k: jax.random.randint(
        k, (n,), 0, 256, jnp.int32).astype(jnp.uint8))
    np.asarray(fn(jax.random.PRNGKey(0)))        # compile + warm the channel
    t0 = time.perf_counter()
    np.asarray(fn(jax.random.PRNGKey(1)))
    _CACHE["mbps"] = sample_mb / max(time.perf_counter() - t0, 1e-9)
    return _CACHE["mbps"]


def should_fetch_yuv420(env_value: Optional[str] = None,
                        mbps: Optional[float] = None) -> bool:
    """Policy for the half-size I420 decode fetch: the env var
    ``VIDEOCOF_FETCH_YUV420`` ("1"/"0") overrides; otherwise auto-enable
    when the measured transport rate is below the threshold."""
    if env_value is None:
        env_value = os.environ.get("VIDEOCOF_FETCH_YUV420")
    if env_value is not None and env_value != "":
        return env_value == "1"
    if mbps is None:
        mbps = measured_fetch_mbps()
    on = mbps < YUV_AUTO_THRESHOLD_MBPS
    if on and not _CACHE.get("yuv_warned"):
        # announce ONCE: auto-enabling changes output fidelity (4:2:0 chroma
        # subsample — the same loss any mp4 save applies, but raw-frame
        # consumers comparing pixels across runs need to know the switch
        # flipped). Pin VIDEOCOF_FETCH_YUV420=0 for chroma-exact fetches.
        import sys
        print(f"[videocof] transport {mbps:.1f} MB/s < "
              f"{YUV_AUTO_THRESHOLD_MBPS:.0f} MB/s: enabling half-size I420 "
              "decode fetch (4:2:0 chroma; VIDEOCOF_FETCH_YUV420=0 to pin "
              "exact RGB)", file=sys.stderr, flush=True)
        _CACHE["yuv_warned"] = True
    return on
