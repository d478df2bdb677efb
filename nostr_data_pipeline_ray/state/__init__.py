from .lake import Lake

__all__ = ["Lake"]
