"""salt_tpu — a TPU-native SNP-aware short-read alignment engine.

A from-scratch rebuild of the capabilities of the `salt` aligner
(reference: /root/reference, C/pthreads/SSE2) as a batched JAX/XLA/Pallas
program:

* the SNP-augmented FM-index (C-part genome BWT + R-part local-pattern BWT)
  becomes bit-plane rank tables + full suffix-array gather tables laid out
  for vectorized HBM gathers,
* seeding/locate/verify run as fixed-shape batched device kernels,
* SAM emission is reproduced byte-for-byte on the host,
* scale-out uses `jax.sharding` meshes (reads data-parallel, index
  replicated or sharded by reference bin).
"""

__version__ = "0.1.0"
