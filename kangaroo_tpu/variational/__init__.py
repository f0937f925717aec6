"""Variational solvers: ROF/Huber-ROF, TGV-L1, deconvolution, inpainting."""
from . import deconvolution, ops, rof, tgv
