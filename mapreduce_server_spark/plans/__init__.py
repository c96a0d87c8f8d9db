from .explain import plan_string

__all__ = ["plan_string"]
