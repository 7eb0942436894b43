from .flow_euler import FlowEulerScheduler
from .flow_unipc import FlowUniPCScheduler
from .flow_dpm import FlowDPMScheduler
from .common import flow_shift_sigmas, get_scheduler
from .ddim import DDIMScheduler

SCHEDULERS = {"euler": FlowEulerScheduler, "unipc": FlowUniPCScheduler,
              "dpm++": FlowDPMScheduler, "ddim": DDIMScheduler}

__all__ = [
    "FlowEulerScheduler",
    "FlowUniPCScheduler",
    "FlowDPMScheduler",
    "DDIMScheduler",
    "flow_shift_sigmas",
    "SCHEDULERS",
    "get_scheduler",
]
