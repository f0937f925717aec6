"""Utilities: device timing."""
from . import timing
