"""Model zoo (the TPU-native counterpart of `videox_fun/models/__init__.py`).

Every model is a pure-functional (init, forward) pair over parameter pytrees:

  Wan family      wan_dit (t2v/i2v + VACE/S2V variants), wan_vae (2.1) +
                  wan_vae_streaming, wan_vae22 (2.2/3.8), t5_encoder (umT5),
                  clip_vision (i2v ViT-H), camera_adapter
  Sibling families cogvideox, cogvideox_vae, flux, qwenimage,
                  kl_vae (2D AutoencoderKL decoder for Flux pixels)
  Acceleration    teacache, lora (weight fusion), weights (checkpoint IO)

Submodules load lazily (PEP 562): importing one family does not pay for the
rest — the same keep-bare-imports-light scheme as the top-level package.
"""

import importlib

_SUBMODULES = (
    "camera_adapter", "clip_vision", "cogvideox", "cogvideox_vae", "flux",
    "kl_vae", "lora", "qwenimage", "qwenimage_vae", "rope", "t5_encoder", "teacache",
    "wan_dit", "wan_dit_s2v", "wan_dit_vace", "wan_vae", "wan_vae22",
    "wan_vae22_streaming", "wan_vae_streaming", "weights", "xlm_roberta",
)

__all__ = list(_SUBMODULES)


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULES))
