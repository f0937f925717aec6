"""Gauss-Newton solvers: LSS, ICP, photometric, plane fit, calibration."""
from . import calibration, icp, lss, manhattan, photometric, plane_fit
