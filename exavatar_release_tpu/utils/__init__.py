from .logging import Timer, make_logger

__all__ = ["Timer", "make_logger"]
