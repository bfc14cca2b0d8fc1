"""SANeRF-HQ-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of lyclyc52/SANeRF-HQ ("Segment Anything for NeRF in High Quality").

Three-stage pipeline:
  1. RGB NeRF  — Instant-NGP-style hash-grid radiance field with proposal
     sampling (reference: nerf/renderer.py, nerf/network.py).
  2. SAM feature container — a second hash-grid field caching or distilling
     HQ-SAM ViT-H encoder features (reference: nerf/trainer.py:507-555).
  3. Object field — lifting per-view SAM masks into a consistent 3-D mask
     field (reference: nerf/trainer.py:401-505).

Everything here is a fresh TPU-first design: fixed-shape proposal sampling
maps directly onto jit/pjit; hash-grid gathers run as XLA gathers (with a
Pallas fast path); parallelism is a jax.sharding Mesh over the ray axis.
"""

__version__ = "0.1.0"
