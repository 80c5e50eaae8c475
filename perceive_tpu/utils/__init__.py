from .batch_sender import BatchSender
from .platform import platform_of
from .time_tracker import TimeTracker

__all__ = ["BatchSender", "TimeTracker", "platform_of"]
