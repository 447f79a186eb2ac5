from .kernel import SlicingWindowOperator, WindowResult
from .windows import SessionWindow, SlidingWindow, TumblingWindow, Window, WindowMeasure

__all__ = [
    "SlicingWindowOperator",
    "WindowResult",
    "Window",
    "WindowMeasure",
    "TumblingWindow",
    "SlidingWindow",
    "SessionWindow",
]
