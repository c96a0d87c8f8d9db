from .numeric import davg, dsum

__all__ = ["davg", "dsum"]
