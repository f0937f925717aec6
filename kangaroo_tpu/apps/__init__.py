"""Application drivers: KinectFusion, variational stereo, SGM stereo."""
from . import kinectfusion, stereo, stereo_sgm, synthetic
