from .train_step import (flow_matching_loss, make_train_step, TrainState,
                         make_lora_train_step, LoRATrainState)
from .timestep_sampler import DiscreteSampling

__all__ = ["flow_matching_loss", "make_train_step", "TrainState",
           "DiscreteSampling"]
