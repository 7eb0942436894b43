"""videocof-tpu: a TPU-native chain-of-frames video-editing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of knightyxp/VideoCoF
(see SURVEY.md): Wan2.1-style DiT denoiser with CoF segment-aware 3D RoPE,
causal 3D video VAE, umT5 text encoder, flow-matching samplers
(Euler / UniPC / DPM-Solver++), LoRA weight fusion, TeaCache step skipping,
CFG + cfg-skip, and mesh-based parallelism (data / Ulysses sequence /
ring attention) over ICI.

Everything on the compute path is pure-functional JAX: parameters are pytrees,
models are `init`/`apply` pairs, and the samplers precompute all
data-independent coefficients on the host so that the denoise loop is a single
compiled XLA program.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy convenience exports (keep bare `import videocof_tpu` light)
    if name == "WanPipeline":
        from .pipeline import WanPipeline
        return WanPipeline
    if name == "Wan22Pipeline":
        from .pipeline import Wan22Pipeline
        return Wan22Pipeline
    if name == "load_pipeline":
        from .factory import load_pipeline
        return load_pipeline
    raise AttributeError(name)
