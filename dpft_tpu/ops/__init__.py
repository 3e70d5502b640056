"""Jittable compute primitives: geometry, IoU, matching, attention kernels."""
