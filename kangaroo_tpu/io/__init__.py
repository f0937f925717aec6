"""Host-side IO: PXM images/volumes (reference parity), PLY meshes."""
