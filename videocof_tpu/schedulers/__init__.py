from .flow_euler import FlowEulerScheduler
from .flow_unipc import FlowUniPCScheduler
from .flow_dpm import FlowDPMScheduler
from .common import flow_shift_sigmas, get_scheduler

SCHEDULERS = {"euler": FlowEulerScheduler, "unipc": FlowUniPCScheduler,
              "dpm++": FlowDPMScheduler}

__all__ = [
    "FlowEulerScheduler",
    "FlowUniPCScheduler",
    "FlowDPMScheduler",
    "flow_shift_sigmas",
    "SCHEDULERS",
    "get_scheduler",
]
