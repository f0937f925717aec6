"""Utilities: device timing."""
from . import profiling, timing
