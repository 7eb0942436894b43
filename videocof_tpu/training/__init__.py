from .train_step import flow_matching_loss, make_train_step, TrainState
from .timestep_sampler import DiscreteSampling

__all__ = ["flow_matching_loss", "make_train_step", "TrainState",
           "DiscreteSampling"]
