from . import attention, layernorm

__all__ = ["attention", "layernorm"]
