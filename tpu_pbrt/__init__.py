"""tpu-pbrt — a TPU-native physically based raytracer (JAX / XLA / Pallas).

A brand-new wavefront path tracer with the capabilities of the
DirectX-Physically-Based-Raytracer reference (see SURVEY.md): metallic/roughness
PBR with a 3-lobe BSDF, LBVH build/refit + stackless traversal replacing
hardware ``TraceRay``, glTF + JSON scene loading, ReSTIR DI, a SHARC-style
hash-grid radiance cache, and a temporal-denoise/bloom/tonemap tail — all
designed TPU-first: SoA ray pools, static shapes, ``lax`` control flow, and
pixel-tile sharding over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
