from .controller import VideoCoFClient, VideoCoFController

__all__ = ["VideoCoFController", "VideoCoFClient"]
