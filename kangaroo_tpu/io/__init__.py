"""Host-side IO: PXM images/volumes (reference parity), TSDF dumps, camera
rig files, streaming tracker-pose input."""
from . import frame_loader, pxm, rig, tracker
