"""Device-math layer: SE3, sampling, robust weights, invalid sentinels."""
from . import invalid, reweighting, sampling, se3
