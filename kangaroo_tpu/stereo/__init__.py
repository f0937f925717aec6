"""Stereo stack: census, cost volumes, WTA, SGM, dense stereo, LR check."""
from . import census, costvolume, dense_stereo, dispatch, sgm
