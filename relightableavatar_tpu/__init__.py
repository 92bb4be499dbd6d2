"""relightableavatar_tpu: TPU-native relightable & animatable neural avatars.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
zju3dv/RelightableAvatar (CVPR 2024): animatable neural SDF avatars (AniSDF)
with hierarchical-distance-query sphere tracing, distance-field soft shadows,
and microfacet relighting — built for TPU hardware (static shapes, fused
scan-based tracers, MXU-friendly MLPs, pjit/shard_map mesh parallelism).
"""

__version__ = "0.1.0"
