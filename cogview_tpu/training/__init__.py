from . import checkpointing, optim

__all__ = ["checkpointing", "optim"]
