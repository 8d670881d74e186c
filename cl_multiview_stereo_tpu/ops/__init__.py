"""Compute ops: jnp reference implementations + Pallas TPU kernels.

Every op has (a) a vectorized ``jnp`` implementation that is the source of
truth for behavior (checked against pure-numpy scalar mirrors in
``cl_multiview_stereo_tpu.testing.mirror``), and for the hot paths (b) a
Pallas TPU kernel checked against (a).
"""
