"""Load reference (torch) modules from /root/reference as numeric oracles.

The reference depends on `diffusers` (not installed here) and optional CUDA
libraries. This module installs a minimal, faithful stub of the diffusers
surface the target files touch, registers synthetic `videox_fun.*` parent
packages (so we never execute the heavyweight package __init__ files that
drag in torchvision/every model family), and imports the real module files:

    wan_transformer3d.py   — DiT forward + CoF rope_apply oracle
    wan_vae.py             — causal VAE encode/decode oracle
    fm_solvers_unipc.py    — Flow UniPC trajectory oracle
    fm_solvers.py          — Flow DPM++ trajectory oracle

Only stub classes that merely anchor inheritance are fabricated; every
numeric path executed by the oracles is reference code verbatim, on torch
CPU. DiagonalGaussianDistribution is re-implemented faithfully (chunk into
mean/logvar along dim=1; mode()==mean) because the VAE's output contract
flows through it.
"""

from __future__ import annotations

import functools
import importlib
import inspect
import sys
import types

REF_ROOT = "/root/reference"


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def mod(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    diffusers = mod("diffusers")

    # --- configuration_utils
    cu = mod("diffusers.configuration_utils")

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            if getattr(self, "config", None) is None:
                self.config = _AttrDict()
            self.config.update(kwargs)

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            ba = sig.bind(self, *args, **kwargs)
            ba.apply_defaults()
            cfg = {k: v for k, v in ba.arguments.items() if k != "self"}
            # diffusers registers the config BEFORE running __init__ so the
            # body can read self.config.*
            self.config = _AttrDict(cfg)
            init(self, *args, **kwargs)

        return wrapped

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    cu.FrozenDict = _AttrDict

    # --- loaders
    loaders = mod("diffusers.loaders")
    sfm = mod("diffusers.loaders.single_file_model")

    class FromOriginalModelMixin:
        pass

    class PeftAdapterMixin:
        pass

    sfm.FromOriginalModelMixin = FromOriginalModelMixin
    loaders.FromOriginalModelMixin = FromOriginalModelMixin
    loaders.PeftAdapterMixin = PeftAdapterMixin

    # --- models
    mod("diffusers.models")
    mu_ = mod("diffusers.models.modeling_utils")

    class ModelMixin(nn.Module):
        config = None

        @property
        def dtype(self):
            try:
                return next(self.parameters()).dtype
            except StopIteration:
                return torch.float32

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    mu_.ModelMixin = ModelMixin

    # name anchors pulled in by qwenimage_vae.py's import block but never
    # exercised by its VAE compute (verified: only `get_activation` is called,
    # and only with "silu") — see /root/reference/videox_fun/models/
    # qwenimage_vae.py:37-53.
    act_mod = mod("diffusers.models.activations")

    def get_activation(name):
        return {"silu": nn.SiLU, "swish": nn.SiLU, "relu": nn.ReLU,
                "gelu": nn.GELU, "mish": nn.Mish}[name]()

    act_mod.get_activation = get_activation

    attn_mod = mod("diffusers.models.attention")

    class FeedForward(nn.Module):  # anchor: imported, never instantiated
        pass

    attn_mod.FeedForward = FeedForward

    ap_mod = mod("diffusers.models.attention_processor")

    class Attention(nn.Module):  # anchor
        pass

    ap_mod.Attention = Attention

    emb_mod = mod("diffusers.models.embeddings")

    class TimestepEmbedding(nn.Module):  # anchor
        pass

    class Timesteps(nn.Module):  # anchor
        pass

    emb_mod.TimestepEmbedding = TimestepEmbedding
    emb_mod.Timesteps = Timesteps

    norm_mod = mod("diffusers.models.normalization")

    class AdaLayerNormContinuous(nn.Module):  # anchor
        pass

    norm_mod.AdaLayerNormContinuous = AdaLayerNormContinuous
    norm_mod.RMSNorm = getattr(nn, "RMSNorm", type("RMSNorm", (nn.Module,),
                                                   {}))

    mod("diffusers.models.autoencoders")
    vae_mod = mod("diffusers.models.autoencoders.vae")

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.deterministic = deterministic
            self.std = torch.exp(0.5 * self.logvar)
            self.var = torch.exp(self.logvar)

        def sample(self, generator=None):
            noise = torch.randn(self.mean.shape, generator=generator,
                                dtype=self.mean.dtype)
            return self.mean + self.std * noise

        def mode(self):
            return self.mean

    class DecoderOutput:
        def __init__(self, sample, commit_loss=None):
            self.sample = sample
            self.commit_loss = commit_loss

    vae_mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    vae_mod.DecoderOutput = DecoderOutput

    lora_mod = mod("diffusers.models.lora")

    class LoRACompatibleLinear(nn.Linear):
        pass

    class LoRACompatibleConv(nn.Conv2d):
        pass

    lora_mod.LoRACompatibleLinear = LoRACompatibleLinear
    lora_mod.LoRACompatibleConv = LoRACompatibleConv

    mo = mod("diffusers.models.modeling_outputs")

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

    mo.AutoencoderKLOutput = AutoencoderKLOutput

    class Transformer2DModelOutput:  # anchor
        def __init__(self, sample=None):
            self.sample = sample

    mo.Transformer2DModelOutput = Transformer2DModelOutput

    # --- utils
    du = mod("diffusers.utils")

    def is_torch_version(operation, version):
        from packaging import version as v
        cur = v.parse(torch.__version__.split("+")[0])
        ref = v.parse(version)
        return {"<": cur < ref, "<=": cur <= ref, ">": cur > ref,
                ">=": cur >= ref, "==": cur == ref}[operation]

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            import logging
            return logging.getLogger(name or "diffusers")

    du.is_torch_version = is_torch_version
    du.logging = _Logging()
    du.deprecate = lambda *a, **k: None
    du.is_scipy_available = lambda: True
    du.BaseOutput = object
    du.USE_PEFT_BACKEND = False
    du.scale_lora_layers = lambda *a, **k: None
    du.unscale_lora_layers = lambda *a, **k: None

    au = mod("diffusers.utils.accelerate_utils")
    au.apply_forward_hook = lambda fn: fn
    du.accelerate_utils = au

    tu = mod("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None,
                     layout=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    tu.randn_tensor = randn_tensor
    tu.maybe_allow_in_graph = lambda cls: cls
    du.torch_utils = tu

    # --- schedulers
    mod("diffusers.schedulers")
    su = mod("diffusers.schedulers.scheduling_utils")
    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1

    class SchedulerMixin:
        config = None

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    su.SchedulerMixin = SchedulerMixin
    su.SchedulerOutput = SchedulerOutput

    diffusers.ConfigMixin = ConfigMixin
    diffusers.ModelMixin = ModelMixin


def _install_torchvision_stub():
    """wan_image_encoder imports torchvision.transforms only for the
    (unused-in-oracle) preprocessing Compose; attribute shells suffice."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class _Shell:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _Interp:
        BICUBIC = "bicubic"

    tr.Compose = _Shell
    tr.Resize = _Shell
    tr.ToTensor = _Shell
    tr.Normalize = _Shell
    tr.InterpolationMode = _Interp
    tv.transforms = tr
    # a real-looking spec + version so transformers'
    # _is_package_available("torchvision") doesn't choke on the stub
    import importlib.machinery
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    tv.__version__ = "0.0.0-stub"
    tr.__spec__ = importlib.machinery.ModuleSpec("torchvision.transforms",
                                                 loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def _install_dataset_dep_stubs():
    """dataset_image_video.py imports decord/albumentations/func_timeout at
    module level but the oracle targets (the instruction regex, frame-index
    math, visualization helpers) never call them; attribute shells suffice."""
    class _ShellModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {"__init__": lambda self, *a, **k: None})

    for name in ("albumentations", "decord", "func_timeout"):
        if name not in sys.modules:
            m = _ShellModule(name)
            import importlib.machinery
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    ft = sys.modules["func_timeout"]
    if not hasattr(ft, "_patched"):
        class FunctionTimedOut(Exception):
            pass

        ft.FunctionTimedOut = FunctionTimedOut
        ft.func_timeout = lambda timeout, fn, args=(), kwargs=None: fn(
            *args, **(kwargs or {}))
        ft._patched = True


def _install_videox_fun_parents():
    """Synthetic `videox_fun`, `videox_fun.models`, `videox_fun.utils`,
    `videox_fun.dist` packages: real module files resolve under them, but the
    heavyweight real __init__ bodies never run."""
    if "videox_fun" in sys.modules:
        return
    pkg = types.ModuleType("videox_fun")
    pkg.__path__ = [f"{REF_ROOT}/videox_fun"]
    sys.modules["videox_fun"] = pkg

    models = types.ModuleType("videox_fun.models")
    models.__path__ = [f"{REF_ROOT}/videox_fun/models"]
    sys.modules["videox_fun.models"] = models

    utils = types.ModuleType("videox_fun.utils")
    utils.__path__ = [f"{REF_ROOT}/videox_fun/utils"]
    sys.modules["videox_fun.utils"] = utils

    # `from ..dist import ...` — only names; the SP path is never exercised
    # on the CPU oracle (sp_world_size stays 1).
    dist = types.ModuleType("videox_fun.dist")
    dist.get_sequence_parallel_rank = lambda: 0
    dist.get_sequence_parallel_world_size = lambda: 1
    dist.get_sp_group = lambda: None
    dist.usp_attn_forward = None
    dist.usp_attn_s2v_forward = None
    dist.xFuserLongContextAttention = None
    sys.modules["videox_fun.dist"] = dist

    # `from ..utils import cfg_skip` resolves through the synthetic package:
    # load the real cfg_optimization file and re-export.
    cfg_opt = importlib.import_module("videox_fun.utils.cfg_optimization")
    utils.cfg_skip = cfg_opt.cfg_skip


@functools.lru_cache(maxsize=1)
def load_reference():
    """-> namespace with .wan_transformer3d, .wan_vae, .fm_solvers_unipc,
    .fm_solvers (reference torch modules, CPU)."""
    _install_diffusers_stub()
    _install_torchvision_stub()
    _install_videox_fun_parents()
    ns = types.SimpleNamespace()
    ns.wan_transformer3d = importlib.import_module(
        "videox_fun.models.wan_transformer3d")
    ns.wan_vae = importlib.import_module("videox_fun.models.wan_vae")
    ns.fm_solvers_unipc = importlib.import_module(
        "videox_fun.utils.fm_solvers_unipc")
    ns.fm_solvers = importlib.import_module("videox_fun.utils.fm_solvers")
    ns.wan_xlm_roberta = importlib.import_module(
        "videox_fun.models.wan_xlm_roberta")
    ns.wan_image_encoder = importlib.import_module(
        "videox_fun.models.wan_image_encoder")
    ns.wan_vae3_8 = importlib.import_module("videox_fun.models.wan_vae3_8")
    ns.wan_text_encoder = importlib.import_module(
        "videox_fun.models.wan_text_encoder")
    ns.wan_transformer3d_vace = importlib.import_module(
        "videox_fun.models.wan_transformer3d_vace")
    ns.lora_utils = importlib.import_module("videox_fun.utils.lora_utils")
    # wan_transformer3d_s2v imports wan_audio_injector, which is ABSENT from
    # the reference snapshot (dangling import). Name shells let the module
    # import; the oracle only exercises the first-party block/rope math.
    if "videox_fun.models.wan_audio_injector" not in sys.modules:
        aud = types.ModuleType("videox_fun.models.wan_audio_injector")
        for name in ("AudioInjector_WAN", "CausalAudioEncoder",
                     "FramePackMotioner", "MotionerTransformers"):
            setattr(aud, name, type(name, (), {}))
        aud.rope_precompute = None
        sys.modules["videox_fun.models.wan_audio_injector"] = aud
    ns.wan_transformer3d_s2v = importlib.import_module(
        "videox_fun.models.wan_transformer3d_s2v")
    # QwenImage VAE: self-contained torch math (only `get_activation("silu")`
    # comes from diffusers; the rest of its import block is name anchors).
    ns.qwenimage_vae = importlib.import_module(
        "videox_fun.models.qwenimage_vae")
    _install_dataset_dep_stubs()
    data_pkg = types.ModuleType("videox_fun.data")
    data_pkg.__path__ = [f"{REF_ROOT}/videox_fun/data"]
    sys.modules.setdefault("videox_fun.data", data_pkg)
    ns.dataset_image_video = importlib.import_module(
        "videox_fun.data.dataset_image_video")
    return ns
