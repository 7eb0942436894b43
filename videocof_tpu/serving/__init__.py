from .controller import VideoCoFController

__all__ = ["VideoCoFController"]
