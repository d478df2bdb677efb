from . import scoring, textfns

__all__ = ["scoring", "textfns"]
