"""Host-side IO: PXM images/volumes (reference parity), TSDF dumps."""
from . import frame_loader, pxm
