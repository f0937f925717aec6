"""Container pytrees: Image conventions, Volume, BoundedVolume, Pyramid, Intrinsics, BoundingBox."""
