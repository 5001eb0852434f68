"""Render passes and device-side kernels (the reference's Shaders/ layer)."""
