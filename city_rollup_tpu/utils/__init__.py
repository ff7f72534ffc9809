"""Shared utilities: trace timers, logging helpers."""

from .timers import TraceTimer, DebugTimer
