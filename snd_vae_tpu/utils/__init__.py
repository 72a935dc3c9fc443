from .logging import LossesLogger

__all__ = ["LossesLogger", "native"]
