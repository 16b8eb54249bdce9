"""TPU compute kernels (JAX/XLA/Pallas) — the production hot path.

Every function here is unit-tested bit-exact (where normative) against the
fasthevc_tpu.spec NumPy oracle. Batched layouts put the block dimension
first ([B, N, N]) so XLA tiles the matmuls onto the MXU.
"""
